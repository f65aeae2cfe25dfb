package graft.convert

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Region-rule phone normalization (reference PhoneNumberConverter
  * semantics: parse with default region, validate, RFC 3966 output). */
class PhoneSpec extends AnyFlatSpec with Matchers {

  "Phone.normalize" should "pass through valid international numbers" in {
    Phone.normalize("+1 (555) 123-4567", "FR") shouldBe Some("+15551234567")
    Phone.normalize("+33 1 23 45 67 89", "US") shouldBe Some("+33123456789")
  }

  it should "resolve national formats through the default region" in {
    Phone.normalize("01 23 45 67 89", "FR") shouldBe Some("+33123456789")
    Phone.normalize("020 7946 0958", "GB") shouldBe Some("+442079460958")
    Phone.normalize("(555) 123-4567", "US") shouldBe Some("+15551234567")
    // RU trunk prefix is 8, not 0
    Phone.normalize("8 912 345 67 89", "RU") shouldBe Some("+79123456789")
  }

  it should "honor the region's international dial prefix" in {
    Phone.normalize("011 33 1 23 45 67 89", "US") shouldBe Some("+33123456789")
    Phone.normalize("00 1 555 123 4567", "FR") shouldBe Some("+15551234567")
  }

  it should "strip extensions and the tel: prefix" in {
    Phone.normalize("tel:+15551234567", "US") shouldBe Some("+15551234567")
    Phone.normalize("+1 555 123 4567 ext. 89", "US") shouldBe Some("+15551234567")
    Phone.normalize("555-123-4567 x42", "US") shouldBe Some("+15551234567")
    Phone.normalize("+15551234567;ext=9", "US") shouldBe Some("+15551234567")
  }

  it should "reject numbers violating the region's length rules" in {
    Phone.normalize("+1 555 123 456", "US") shouldBe None // 9-digit US NSN
    Phone.normalize("01 23 45 67", "FR") shouldBe None // 8-digit FR NSN
    Phone.normalize("not a phone", "US") shouldBe None
    Phone.normalize("+12", "US") shouldBe None
  }

  it should "accept leading-0 NSNs where the region has no 0 trunk prefix" in {
    // Italian landlines keep their leading 0 as part of the NSN
    Phone.normalize("06 6982 1234", "IT") shouldBe Some("+390669821234")
    Phone.normalize("00 39 06 6982 1234", "FR") shouldBe Some("+390669821234")
    // a doubled trunk prefix is still invalid where trunk IS 0
    Phone.normalize("00 1234 5678", "JP") shouldBe None
  }

  it should "accept cc-prefixed domestic forms" in {
    Phone.normalize("1 800 555 0199", "US") shouldBe Some("+18005550199")
    Phone.normalize("44 20 7946 0958", "GB") shouldBe Some("+442079460958")
  }

  it should "fall back to the E.164 envelope for unlisted regions/codes" in {
    Phone.normalize("+299 123456", "US") shouldBe Some("+299123456") // Greenland
    Phone.normalize("12345678", "ZZ") shouldBe Some("+12345678")
    Phone.normalize("123", "ZZ") shouldBe None
  }

  "Phone.telUri" should "render RFC 3966" in {
    Phone.telUri("06 12 34 56 78", "FR") shouldBe Some("tel:+33612345678")
  }
}

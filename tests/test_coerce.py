"""Unit tests: JS-semantics scalar coercions (SURVEY §1.4)."""

import math
from datetime import datetime, timezone

from unfurl_spark.functions.coerce import (
    exif_date,
    extract_mime,
    js_date,
    js_number,
    parse_exif_date,
    to_date,
    to_number,
    to_twitter_handle,
    to_url,
    whatwg_url,
)


def test_js_number():
    assert js_number("") == 0.0
    assert js_number("  42 ") == 42.0
    assert js_number("1.5e3") == 1500.0
    assert js_number("0x10") == 16.0
    assert math.isnan(js_number("12px"))
    assert math.isnan(js_number("abc"))
    assert js_number(True) == 1.0


def test_to_number():
    assert to_number("640") == 640.0
    assert to_number("abc") is None
    assert to_number(3) == 3.0
    assert to_number(None) is None


def test_to_date_tz_less_iso_gets_utc():
    d = to_date("2016-06-15T07:21:06")
    assert d == datetime(2016, 6, 15, 7, 21, 6, tzinfo=timezone.utc)


def test_to_date_with_offset():
    d = to_date("2016-06-17T08:35:08-07:00")
    assert d == datetime(2016, 6, 17, 15, 35, 8, tzinfo=timezone.utc)


def test_to_date_invalid():
    assert to_date("not a date") is None
    assert to_date(123) is None


def test_js_date_date_only_is_utc():
    assert js_date("2016-06-15") == datetime(2016, 6, 15, tzinfo=timezone.utc)


def test_exif_date_appends_z():
    d = exif_date("2016-07-11T23:35:24")
    assert d == datetime(2016, 7, 11, 23, 35, 24, tzinfo=timezone.utc)


def test_parse_exif_date_inverted_offset():
    # npm exif-date applies offsets with inverted sign (snapshot-locked)
    d = parse_exif_date("2019:10:31 14:05:18-07:00")
    assert d == datetime(2019, 10, 31, 7, 5, 18, tzinfo=timezone.utc)


def test_whatwg_url():
    assert whatwg_url("http://EXAMPLE.com:80/a/../b") == "http://example.com/b"
    assert whatwg_url("/x?q=1", "https://a.com/base/") == "https://a.com/x?q=1"
    assert whatwg_url("nytimes://x/y", "https://a.com") == "nytimes://x/y"
    assert to_url(None, "https://a.com") is None
    assert to_url("", "https://a.com") is None


def test_extract_mime():
    assert extract_mime("Text/HTML; charset=utf-8") == "text/html"


def test_twitter_handle():
    assert to_twitter_handle("@blakeembrey") == "blakeembrey"
    assert to_twitter_handle("ab@c") == "ab@c"


def test_whatwg_url_invalid_port_and_host_return_none():
    """The WHATWG constructor throws on these; the port must surface as
    None, never as a ValueError that kills the Arrow batch."""
    from unfurl_spark.functions.coerce import whatwg_url
    assert whatwg_url("http://example.com:99999/") is None
    assert whatwg_url("http://example.com:abc/") is None
    assert whatwg_url("http://[abc") is None
    assert whatwg_url("x", "http://example.com:99999/") is None


def test_js_date_lowercase_zone_names():
    from unfurl_spark.functions.coerce import js_date
    up = js_date("Mon, 5 Jan 2020 10:00:00 GMT")
    lo = js_date("Mon, 5 Jan 2020 10:00:00 gmt")
    assert up is not None and lo == up
    assert js_date("Jan 5, 2020 10:00:00 utc") == up

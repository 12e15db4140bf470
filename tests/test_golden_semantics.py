"""Golden tests ported from the reference's own unit tests.

Sources: logparsers/httpservers_test.go (parsing, paths, referers,
timestamps), logparsers/useragent_test.go (20 UA classification cases),
metrics/SBOMetrics_test.go (window accumulator), plus pinned behaviors
from FIXTURES.md §5 (malicious precedence, time windows, truncation).
"""

from datetime import datetime, timedelta, timezone

import pytest

from sbo_ray.functions import loglines as L
from sbo_ray.functions.ua import classify_user_agent


# ---- httpservers_test.go:27-101 — Apache CLF + path split ------------------
def test_clf_parse_with_deep_path():
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /p1/p2/p3/apache_pb.gif HTTP/1.0" 200 2326'
    r = L.parse_line(line, L.FORMAT_APACHE_COMMON)
    assert r.ok
    assert r.client_ip == "127.0.0.1"
    assert r.remote_logname == "-"
    assert r.remote_user == "frank"
    assert r.method == "GET"
    assert r.path == "/p1/p2/p3/apache_pb.gif"
    assert r.path1 == "/p1"
    assert r.path2 == "/p1/p2"
    assert r.path3 == "/p1/p2/p3"
    assert r.protocol == "HTTP/1.0"
    assert r.status == "200"
    assert r.bytes_sent == 2326
    assert r.ts == datetime(2000, 10, 10, 13, 55, 36, tzinfo=timezone(timedelta(hours=-7)))


def test_clf_parse_root_path():
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET / HTTP/1.0" 200 2326'
    r = L.parse_line(line, L.FORMAT_APACHE_COMMON)
    assert r.ok
    assert r.path == "/"
    assert r.path1 == "/"
    assert r.path2 == ""
    assert r.path3 == ""


# ---- httpservers_test.go:117-229 — Nginx combined + referers ---------------
def test_nginx_combined_dash_referer():
    line = '127.0.0.1 - - [10/Oct/2000:13:55:36 -0700] "GET / HTTP/1.1" 200 612 "-" "Mozilla/5.0 (Macintosh)"'
    r = L.parse_line(line, L.FORMAT_NGINX_COMBINED)
    assert r.ok
    assert r.referer == ""  # "-" parses, Hostname() is empty
    assert r.ua.family == "Other"
    assert r.ua.os == "MacOS"
    assert r.remote_logname == ""  # nginx never captures it


def test_nginx_combined_referer_hostname():
    line = ('127.0.0.1 - - [10/Oct/2000:13:55:36 -0700] "GET / HTTP/1.1" 200 612 '
            '"https://example.com/somepage" "Mozilla/5.0 (Macintosh)"')
    r = L.parse_line(line, L.FORMAT_NGINX_COMBINED)
    assert r.referer == "example.com"


def test_utm_source_overrides_referer():
    line = ('127.0.0.1 - - [10/Oct/2000:13:55:36 -0700] "GET /?a=b&utm_source=justexample HTTP/1.1" '
            '200 612 "https://example.com/somepage" "Mozilla/5.0 (Macintosh)"')
    r = L.parse_line(line, L.FORMAT_NGINX_COMBINED)
    assert r.referer == "justexample"


# ---- httpservers_test.go:290-310 — utm anchor edge cases -------------------
def test_aaautm_source_does_not_match():
    assert (
        L.normalize_referer("http://casualgames.dev/page", "/x?apx=upx&AAAutm_source=google")
        == "casualgames.dev"
    )


def test_utm_source_mid_query_matches():
    assert L.normalize_referer("http://x.dev/", "/x?apx=upx&utm_source=google&otherparam=1") == "google"


def test_www_prefix_stripped():
    assert L.normalize_referer("http://www.example.com/start.html", "/a") == "example.com"


# ---- timestamps (httpservers_test.go:103-115, 262-288) ---------------------
def test_apache_timestamp():
    ts = L.parse_apache_timestamp("10/Oct/2000:13:55:36 -0700")
    assert ts.utcoffset() == timedelta(hours=-7)
    assert ts.year == 2000 and ts.hour == 13


def test_haproxy_timestamp():
    ts = L.parse_haproxy_timestamp("06/Feb/2009:12:14:14.655")
    assert ts == datetime(2009, 2, 6, 12, 14, 14, 655000, tzinfo=timezone.utc)


def test_bad_timestamp_is_go_zero_time():
    assert L.parse_apache_timestamp("not a timestamp") == L.GO_ZERO_TIME


# ---- useragent_test.go:121-661 — 20 UA classification goldens --------------
UA_CASES = [
    # (ua, device_type, family, human, os, intent)
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_7_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/137.0.7151.51 Mobile/15E148 Safari/604.1",
     "Mobile", "Chrome", "Unknown", "IOS", None),
    ("Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko); compatible; GPTBot/1.1; +https://openai.com/gptbot",
     "Script", "AIBot", "NonHuman", "Other", None),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/136.0.0.0 Safari/537.36",
     "Desktop", "Chrome", "Unknown", "MacOS", None),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/91.0.4472.124 Safari/537.36 Edg/91.0.864.59",
     "Desktop", "Edge", "Unknown", "Windows", None),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.3.1 Safari/605.1.15",
     "Desktop", "Safari", "Unknown", "MacOS", None),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10.15; rv:138.0) Gecko/20100101 Firefox/138.0",
     "Desktop", "Firefox", "Unknown", "MacOS", None),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_7_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.4 Mobile/15E148 Safari/604.1",
     "Mobile", "Safari", "Unknown", "IOS", None),
    ("Mozilla/5.0 (Linux; Android 15) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/136.0.7103.127 Mobile Safari/537.36",
     "Mobile", "Chrome", "Unknown", "Android", None),
    ("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
     "Script", "SearchBot", "NonHuman", "Other", None),
    ("Mozilla/5.0 (Linux; Android 6.0.1; Nexus 5X Build/MMB29P) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/W.X.Y.Z Mobile Safari/537.36 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
     "Script", "SearchBot", "NonHuman", "Other", None),
    ("Mozilla/5.0 (compatible; AhrefsBot/7.0; +http://ahrefs.com/robot/)",
     "Script", "SEOBot", "NonHuman", "Other", None),
    ("Mozilla/5.0 (Linux; Android 5.0) AppleWebKit/537.36 (KHTML, like Gecko) Mobile Safari/537.36 (compatible; Bytespider; spider-feedback@bytedance.com)",
     "Script", "SocialBot", "NonHuman", "Other", None),
    ("Bytespider", "Script", "SocialBot", "NonHuman", "Other", None),
    ("Dalvik/2.1.0 (Linux; U; Android 9.0; ZTE BA520 Build/MRA58K)",
     "Mobile", "Other", "Unknown", "Android", None),
    ("facebookexternalhit/1.1 (+http://www.facebook.com/externalhit_uatext.php)",
     "Script", "SocialBot", "NonHuman", "Other", None),
    ("facebook/1.1", "Script", "OtherBot", "NonHuman", "Other", None),
    ("meta-externalagent/1.1 (+https://developers.facebook.com/docs/sharing/webmasters/crawler)",
     "Script", "AIBot", "NonHuman", "Other", None),
    ("Mozilla/5.0 zgrab/0.x", "Script", "Scanner", "NonHuman", "Other", "Scanning"),
    ("Expanse, a Palo Alto Networks company, searches across the global IPv4 space multiple times per day to identify customers&#39; presences on the Internet. If you would like to be excluded from our scans, please send IP addresses/domains to: scaninfo@paloaltonetworks.com",
     "Script", "Scanner", "NonHuman", "Other", "Scanning"),
    ("Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko; compatible; Amazonbot/0.1; +https://developer.amazon.com/support/amazonbot) Chrome/119.0.6045.214 Safari/537.36",
     "Script", "AIBot", "NonHuman", "Other", "Processing"),
]


@pytest.mark.parametrize("ua,device,family,human,os,intent", UA_CASES)
def test_ua_classification(ua, device, family, human, os, intent):
    r = classify_user_agent(ua)
    assert r.device_type == device
    assert r.family == family
    assert r.human == human
    assert r.os == os
    if intent is not None:
        assert r.intent == intent


def test_blex_bug_shadowed_by_otherbot_override():
    # useragent.go:283 sets DeviceType="SEOBot", but the OtherBot override
    # at useragent.go:265-269 then resets it to Script when the family is
    # still OtherBot; the Processing intent survives as the observable trace.
    r = classify_user_agent("Mozilla/5.0 (compatible; BLEXBot/1.0; +http://webmeup-crawler.com/)")
    assert r.device_type == "Script"
    assert r.family == "OtherBot"
    assert r.intent == "Processing"


def test_blex_bug_observable_when_family_changes_later():
    # a later Chrome token moves the family off OtherBot, so the buggy
    # DeviceType="SEOBot" from useragent.go:283 becomes observable.
    r = classify_user_agent("Mozilla/5.0 (compatible; BLEXBot/1.0) Chrome/99.0")
    assert r.device_type == "SEOBot"
    assert r.family == "Chrome"
    assert r.intent == "Processing"


def test_robots_txt_override():
    line = ('1.2.3.4 - - [10/Oct/2000:13:55:36 -0700] "GET /robots.txt HTTP/1.1" 200 10 "-" '
            '"Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.3.1 Safari/605.1.15"')
    r = L.parse_line(line, L.FORMAT_NGINX_COMBINED)
    assert r.ua.human == "NonHuman"
    assert r.ua.device_type == "Script"
    assert r.ua.family == "OtherBot"  # Safari is not bot-like -> forced


# ---- malicious classification (httpservers.go:124-165) ---------------------
@pytest.mark.parametrize(
    "uri,expected",
    [
        ("/a/../etc/passwd", 30),
        ("/a/b%00c", 30),
        ("/q?q=<script>alert(1)", 20),
        ("/q?id='1 insert into x", 10),
        ("/normal/path?x=1", 0),
        ("badrequest", 1),  # no leading slash, no scheme -> ParseRequestURI error
        ("/bad%zzescape", 1),  # invalid percent escape
    ],
)
def test_malicious_classification(uri, expected):
    assert L.split_path(uri).malicious == expected


def test_invalid_uri_path_cut_before_query():
    p = L.split_path("bad?q=1")
    assert p.malicious == 1
    assert p.path == "bad"
    assert p.path1 == p.path2 == p.path3 == ""


def test_encoded_traversal_detected_after_decode():
    # Go unescapes the path, so %2e%2e -> .. and the decoded path matches /../
    assert L.split_path("/a/%2e%2e/etc").malicious == 30


# ---- time windows (metricgenerator.go:131-158; FIXTURES.md §5.5) -----------
@pytest.mark.parametrize(
    "minute,size,expected_min",
    [(30, 10, 30), (30, 15, 30), (30, 60, 0), (30, 1, 30), (29, 10, 20), (29, 5, 25)],
)
def test_time_window(minute, size, expected_min):
    ts = datetime(2025, 7, 2, 11, minute, 22, tzinfo=timezone.utc)
    assert L.calculate_time_window(ts, size) == 202507021100 + expected_min


def test_time_window_uses_local_clock_fields():
    # 13:55 -0700 local -> window 200010101350, not the UTC 20:55
    ts = L.parse_apache_timestamp("10/Oct/2000:13:55:36 -0700")
    assert L.calculate_time_window(ts, 10) == 200010101350


# ---- truncation (db/mysqldb.go:224-238; FIXTURES.md §5.7) ------------------
def test_truncation():
    assert L.reduce_to_max_len("abcdef", 3) == "abc"
    assert L.reduce_to_max_len("ab", 3) == "ab"
    assert L.reduce_to_max_len_keeping_last("abcdef", 3) == "def"
    assert L.reduce_to_max_len_keeping_last("ab", 3) == "ab"

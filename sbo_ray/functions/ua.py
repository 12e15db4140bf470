"""User-agent classification with the exact semantics of the reference's
``logparsers/useragent.go`` (NewSBOUserAgent, useragent.go:126-287).

Closed enums (useragent.go:62-103): 12 UA families, 6 OS families,
4 device types, 3 human states, 5 intents. The decision tree is:

1. six lowercase bot regex tiers in priority order (useragent.go:105-115,
   136-165): search > social > SEO/marketing > AI > scanner > script;
2. single-token heuristics when the UA has no space (useragent.go:167-183);
3. otherwise a token scan of ``(...)`` groups and ``name/ver`` products
   (regex ``\\s*\\(([^)]+)\\)|\\s*([^/]+/[^ ]+)``, useragent.go:191) with
   browser-precedence overrides (useragent.go:252-263) and the
   ``compatible``-part handler (useragent.go:276-287) — including the
   reference's observable bug where a ``blex`` bot gets
   ``DeviceType = "SEOBot"`` (useragent.go:283), reproduced bit-for-bit.

Go's ``regexp`` (RE2 syntax, leftmost-first submatching) and Python ``re``
agree on every pattern used here; pinned by golden tests ported from
``logparsers/useragent_test.go``.
"""

from __future__ import annotations

import re
from typing import NamedTuple

# ---- enums (useragent.go:62-103) ------------------------------------------
UA_FAMILY_OTHER = "Other"
UA_FAMILY_CHROME = "Chrome"
UA_FAMILY_FIREFOX = "Firefox"
UA_FAMILY_SAFARI = "Safari"
UA_FAMILY_EDGE = "Edge"
UA_FAMILY_SEARCHBOT = "SearchBot"
UA_FAMILY_AIBOT = "AIBot"
UA_FAMILY_SCRIPT = "Script"
UA_FAMILY_SOCIALBOT = "SocialBot"
UA_FAMILY_OTHERBOT = "OtherBot"
UA_FAMILY_SEOBOT = "SEOBot"
UA_FAMILY_SCANNER = "Scanner"

OS_OTHER = "Other"
OS_WINDOWS = "Windows"
OS_MACOS = "MacOS"
OS_LINUX = "Linux"
OS_ANDROID = "Android"
OS_IOS = "IOS"

DEVICE_UNKNOWN = "Unknown"
DEVICE_DESKTOP = "Desktop"
DEVICE_MOBILE = "Mobile"
DEVICE_SCRIPT = "Script"

HUMAN_YES = "Human"
HUMAN_NO = "NonHuman"
HUMAN_UNKNOWN = "Unknown"

INTENT_UNKNOWN = "Unknown"
INTENT_SCRAPING = "Scraping"
INTENT_MALICIOUS = "Malicious"
INTENT_SCANNING = "Scanning"
INTENT_PROCESSING = "Processing"

# ---- bot tiers (useragent.go:105-115) -------------------------------------
RE_SEARCH_BOTS = re.compile(r"(googlebot|bingbot|baiduspider|yandexbot|duckduckbot)")
RE_SOCIAL_BOTS = re.compile(
    r"(facebookexternalhit|twitterbot|linkedinbot|pinterestbot|slackbot|bytespider)"
)
RE_MARKETING_BOTS = re.compile(
    r"(ahrefs|semrush|dotbot|mj12bot|seobilitybot|siteauditbot|yandex.)"
)
RE_AI_BOTS = re.compile(
    r"(gptbot|chatgpt|google-extended|claudebot|meta-externalagent|amazonbot|perplexitybot|youbot)"
)
RE_SCANNER_BOTS = re.compile(
    r"(censysinspect|expanse|aliyunsecbot|nmap|masscan|zgrab|shodanbot|urlscan|tchelebi)"
)
RE_SCRIPT_AGENTS = re.compile(
    r"(curl|scrapy|wget|python|go-http-client|java|ruby|okhttp|postman|axios"
    r"|guzzlehttp|headlesschrome|phantomjs|cloudflare-traffic-manager)"
)

# token scan regex (useragent.go:191)
RE_UA_TOKENS = re.compile(r"\s*\(([^)]+)\)|\s*([^/]+/[^ ]+)")


class UAResult(NamedTuple):
    full_name: str
    os: str
    family: str
    device_type: str
    human: str
    intent: str


def _process_compatible_part(state: dict, compatible_part: str) -> None:
    """processCompatiblePart (useragent.go:276-287), incl. the ':283' bug
    where DeviceType is set to the *family* constant "SEOBot"."""
    lower = compatible_part.lower()
    if "bot" in lower:
        state["device_type"] = DEVICE_SCRIPT
        state["human"] = HUMAN_NO
        state["family"] = UA_FAMILY_OTHERBOT
        if "blex" in lower:
            state["device_type"] = UA_FAMILY_SEOBOT  # reference bug, kept
            state["intent"] = INTENT_PROCESSING


def classify_user_agent(ua_string: str) -> UAResult:
    """NewSBOUserAgent (useragent.go:126-274), field-for-field."""
    state = {
        "os": OS_OTHER,
        "family": UA_FAMILY_OTHER,
        "device_type": DEVICE_UNKNOWN,
        "human": HUMAN_UNKNOWN,
        "intent": INTENT_UNKNOWN,
    }
    lower = ua_string.lower()
    if RE_SEARCH_BOTS.search(lower):
        state.update(
            device_type=DEVICE_SCRIPT, family=UA_FAMILY_SEARCHBOT,
            human=HUMAN_NO, intent=INTENT_PROCESSING,
        )
    elif RE_SOCIAL_BOTS.search(lower):
        state.update(
            device_type=DEVICE_SCRIPT, family=UA_FAMILY_SOCIALBOT,
            human=HUMAN_NO, intent=INTENT_PROCESSING,
        )
    elif RE_MARKETING_BOTS.search(lower):
        state.update(
            device_type=DEVICE_SCRIPT, family=UA_FAMILY_SEOBOT,
            human=HUMAN_NO, intent=INTENT_PROCESSING,
        )
    elif RE_AI_BOTS.search(lower):
        state.update(
            device_type=DEVICE_SCRIPT, family=UA_FAMILY_AIBOT,
            human=HUMAN_NO, intent=INTENT_PROCESSING,
        )
    elif RE_SCANNER_BOTS.search(lower):
        state.update(
            device_type=DEVICE_SCRIPT, family=UA_FAMILY_SCANNER,
            human=HUMAN_NO, intent=INTENT_SCANNING,
        )
    elif RE_SCRIPT_AGENTS.search(lower):
        state.update(
            device_type=DEVICE_SCRIPT, family=UA_FAMILY_SCRIPT,
            human=HUMAN_NO, intent=INTENT_SCRAPING,
        )
    else:
        before, sep, after = ua_string.partition(" ")
        if not sep:  # single token (useragent.go:167-183)
            lower_before = before.lower()
            if "google" in lower_before:
                state["family"] = UA_FAMILY_SEARCHBOT
            elif lower_before.startswith("facebook"):
                state["family"] = UA_FAMILY_OTHERBOT
                state["device_type"] = DEVICE_SCRIPT
            elif lower_before.startswith("meta-"):
                state["family"] = UA_FAMILY_AIBOT
                state["device_type"] = DEVICE_SCRIPT
            elif (
                "curl" in lower_before
                or lower_before.startswith("go-")
                or "java" in lower_before
                or "apache" in lower_before
                or "php" in lower_before
                or "python" in lower_before
                or "requests" in lower_before
            ):
                state["family"] = UA_FAMILY_SCRIPT
            state["human"] = HUMAN_NO
        else:  # token scan (useragent.go:184-270)
            found_crios = found_chrome = found_safari = False
            found_firefox = found_edge = False
            for m in RE_UA_TOKENS.finditer(after):
                paren, product = m.group(1), m.group(2)
                if paren:  # parenthesized group
                    if paren.startswith("Windows"):
                        state["device_type"] = DEVICE_DESKTOP
                        state["os"] = OS_WINDOWS
                    elif paren.startswith("Mac"):
                        state["device_type"] = DEVICE_DESKTOP
                        state["os"] = OS_MACOS
                    elif paren.startswith("iPhone") or paren.startswith("iPad"):
                        state["device_type"] = DEVICE_MOBILE
                        state["os"] = OS_IOS
                    elif "Android" in paren:
                        state["device_type"] = DEVICE_MOBILE
                        if "Googlebot" in paren:
                            state["human"] = HUMAN_NO
                        state["os"] = OS_ANDROID
                    elif "Linux" in paren:
                        state["device_type"] = DEVICE_DESKTOP
                        state["os"] = OS_LINUX
                    elif paren.startswith("compatible"):
                        _process_compatible_part(state, paren)
                    elif "Claude" in paren:
                        state["human"] = HUMAN_NO
                        state["family"] = UA_FAMILY_AIBOT
                        state["device_type"] = DEVICE_SCRIPT
                elif product:  # xxxx/yyyy
                    if product.startswith("Chrome"):
                        state["family"] = UA_FAMILY_CHROME
                        found_chrome = True
                    elif product.startswith("Safari"):
                        state["family"] = UA_FAMILY_SAFARI
                        found_safari = True
                    elif product.startswith("CriOS"):
                        state["family"] = UA_FAMILY_CHROME
                        state["os"] = OS_IOS
                        found_crios = True
                    elif product.startswith("Edg"):
                        state["family"] = UA_FAMILY_EDGE
                        state["os"] = OS_WINDOWS
                        found_edge = True
                    elif product.startswith("Firefox"):
                        state["family"] = UA_FAMILY_FIREFOX
                        found_firefox = True
                    elif "compatible" in product:
                        _process_compatible_part(state, product)
                    elif "openai" in product:
                        state["human"] = HUMAN_NO
                        state["family"] = UA_FAMILY_AIBOT
                        state["device_type"] = DEVICE_SCRIPT
                    elif "Claude" in product:
                        state["human"] = HUMAN_NO
                        state["family"] = UA_FAMILY_AIBOT
                        state["device_type"] = DEVICE_SCRIPT
            # precedence overrides (useragent.go:252-263)
            if found_crios:
                state["family"] = UA_FAMILY_CHROME
                state["os"] = OS_IOS
            elif found_edge:
                state["family"] = UA_FAMILY_EDGE
                state["os"] = OS_WINDOWS
            elif found_safari and found_chrome:
                state["family"] = UA_FAMILY_CHROME
            elif found_safari and not found_chrome and not found_edge and not found_firefox:
                state["family"] = UA_FAMILY_SAFARI

            if state["family"] in (UA_FAMILY_SEARCHBOT, UA_FAMILY_OTHERBOT):
                state["device_type"] = DEVICE_SCRIPT
                state["os"] = OS_OTHER
                state["human"] = HUMAN_NO

    return UAResult(
        full_name=ua_string,
        os=state["os"],
        family=state["family"],
        device_type=state["device_type"],
        human=state["human"],
        intent=state["intent"],
    )


_BOTLIKE_FAMILIES = frozenset(
    {UA_FAMILY_AIBOT, UA_FAMILY_SEOBOT, UA_FAMILY_SCRIPT, UA_FAMILY_SEARCHBOT, UA_FAMILY_SOCIALBOT}
)


def apply_robots_txt_override(ua: UAResult, path1: str) -> UAResult:
    """SBOHttpRequestLogSetUserAgent robots.txt override
    (httpservers.go:63-77): a /robots.txt request is assumed to be a bot."""
    if path1 != "/robots.txt":
        return ua
    family = ua.family if ua.family in _BOTLIKE_FAMILIES else UA_FAMILY_OTHERBOT
    return ua._replace(human=HUMAN_NO, device_type=DEVICE_SCRIPT, family=family)

"""URL scalar functions (SURVEY §1.3, §2.8 URL/hash families).

Ports, as pure JVM-side column expressions (no Python UDFs in the hot
path):

- `normalize_url` / `url_hash` — `/root/reference/src/url_utils.py:12-47`:
  lowercase scheme+host, strip `www.`, collapse `//+` in the path,
  drop tracking params (utm_*, gaa_*, and a fixed set), sort remaining
  query pairs by key, drop fragments; hash = sha256(normalized).
- `hostname` — `src/risk_rules.py:64-69`.
- finance-routine / material-risk / ticker regexes —
  `src/risk_rules.py:27-52`.
- `classify_control` core — `src/risk_rules.py:284-346`: social-path
  rules, always-controlled domains, brand-token-in-host, CEO path
  keywords, company handle/page checks for x/linkedin/youtube.

r14 completes the `risk_rules.py:141-265` slug/handle tail: brand
YouTube channels (`:141-163`), LinkedIn company pages + token-overlap
slug matching (`:165-201`), LinkedIn person profiles (`:204-225`),
X/Twitter company and person handles (`:228-265`), publisher-name
matching (`:91-116`) and per-company registered domains
(`:267-281,334-340`) — the latter three behind optional columns
(person_name / publisher / company_domains) since the synthetic schema
doesn't carry them; passing them exercises the full reference rule
order.

Deliberate divergence (documented, driver-test-invisible): query
values are not percent-re-encoded (reference round-trips through
parse_qsl/urlencode).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# src/url_utils.py:5-10
TRACKING_PARAMS = [
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "igshid", "mc_cid", "mc_eid", "vero_id",
    "gaa_at", "gaa_n", "gaa_ts", "gaa_sig",
]

# src/risk_rules.py:4-25
ALWAYS_CONTROLLED_DOMAINS = ["facebook.com", "instagram.com", "play.google.com", "apps.apple.com"]
CEO_UNCONTROLLED_DOMAINS = ["wikipedia.org", "youtube.com", "youtu.be", "tiktok.com"]
CEO_CONTROLLED_PATH_KEYWORDS = [
    "/leadership/", "/about/", "/governance/", "/team/", "/investors/",
    "/board-of-directors", "/members/", "/member/",
]

# src/risk_rules.py:27-52 — joined exactly as the reference compiles them.
FINANCE_TERMS_RE = (
    r"(?i)\bearnings\b|\beps\b|\brevenue\b|\bguidance\b|\bforecast\b"
    r"|\bprice target\b|\bupgrade\b|\bdowngrade\b|\bdividend\b"
    r"|\bbuyback\b|\bshares?\b|\bstock\b|\bmarket cap\b"
    r"|\bquarterly\b|\bfiscal\b|\bprofit\b|\bEBITDA\b"
    r"|\b10-q\b|\b10-k\b|\bsec\b|\bipo\b"
)
MATERIAL_RISK_TERMS_RE = (
    r"(?i)\blawsuits?\b|\blegal action\b|\bclass action\b|\bsu(?:e|es|ed|ing)\b"
    r"|\bsettle(?:ment|d|s)?\b|\bprobe\b|\binvestigat(?:e|es|ed|ion|ions)\b"
    r"|\bsubpoena(?:s)?\b|\bsec (?:probe|investigation|charge|charges)\b|\bdoj\b"
    r"|\bcharge(?:d|s)?\b|\bindict(?:ed|ment)?\b|\bfraud\b|\bscandal\b"
    r"|\bbankrupt(?:cy|cies)?\b|\blayoffs?\b|\brecall(?:s|ed)?\b|\bdata breach(?:es)?\b"
    r"|\bcyber(?:attack|attacks|breach|breaches)\b|\bwhistleblower(?:s)?\b"
    r"|\bmisconduct\b|\bboycott(?:s|ed)?\b"
)
TICKER_RE = r"\b(?:NYSE|NASDAQ|AMEX):\s?[A-Z]{1,5}\b"


def hostname(url: Column) -> Column:
    """Lowercased host with a leading `www.` stripped
    (`src/risk_rules.py:64-69`)."""
    host = F.lower(F.coalesce(F.parse_url(url, F.lit("HOST")), F.lit("")))
    return F.regexp_replace(host, r"^www\.", "")


def _is_tracking(key: Column) -> Column:
    cond = key.startswith("utm_") | key.startswith("gaa_")
    return cond | key.isin(TRACKING_PARAMS)


def normalize_url(url: Column) -> Column:
    """`src/url_utils.py:12-40` as one expression tree: returns '' for
    null/blank input; otherwise scheme://host/path?sorted_query with
    tracking params removed and fragments dropped."""
    trimmed = F.trim(url)
    scheme = F.lower(F.coalesce(F.parse_url(trimmed, F.lit("PROTOCOL")), F.lit("http")))
    host = hostname(trimmed)
    path = F.regexp_replace(
        F.coalesce(F.parse_url(trimmed, F.lit("PATH")), F.lit("")), r"/{2,}", "/"
    )
    raw_query = F.coalesce(F.parse_url(trimmed, F.lit("QUERY")), F.lit(""))
    pairs = F.filter(
        F.split(raw_query, "&"),
        lambda p: (p != "") & ~_is_tracking(F.split_part(p, F.lit("="), F.lit(1))),
    )
    # Sort by (key, full pair) to match the reference's (k, v) tuple
    # sort; plain string sort would order 'a1=..' before 'a=..'.
    # struct sort_array (native lexicographic struct ordering) instead
    # of a comparator lambda: one codegen'd comparison per element
    # rather than four split_part calls per comparison.
    keyed = F.transform(
        pairs, lambda p: F.struct(F.split_part(p, F.lit("="), F.lit(1)).alias("k"), p.alias("p"))
    )
    sorted_pairs = F.transform(F.sort_array(keyed), lambda s: s["p"])
    query = F.array_join(sorted_pairs, "&")
    base = F.concat(scheme, F.lit("://"), host, path)
    normalized = F.when(query == "", base).otherwise(F.concat(base, F.lit("?"), query))
    return F.when(url.isNull() | (trimmed == ""), F.lit("")).otherwise(normalized)


def url_hash(url: Column) -> Column:
    """sha256 hex of the normalized URL; '' for empty
    (`src/url_utils.py:43-47`). The empty-guard tests the RAW input
    (normalize returns '' iff input is null/blank), so the normalize
    pipeline is evaluated once, not twice — measured 2x on the sf0.1
    dedup path."""
    blank = url.isNull() | (F.trim(url) == "")
    return F.when(blank, F.lit("")).otherwise(F.sha2(normalize_url(url), 256))


def _host_matches(host: Column, domain: str) -> Column:
    return (host == domain) | host.endswith("." + domain)


def _norm_token(c: Column) -> Column:
    return F.regexp_replace(F.lower(c), r"[^a-z0-9]", "")


# src/risk_rules.py:54-62
NAME_IGNORE_TOKENS = [
    "inc", "incorporated", "corporation", "corp", "company", "co",
    "llc", "ltd", "limited", "plc", "group", "holdings", "holding",
    "the", "and", "of", "services",
]
PUBLISHER_SUFFIX_TOKENS = [
    "news", "newsroom", "media", "press", "wire", "blog", "official",
]


def _name_tokens(value: Column, min_len: int) -> Column:
    """`_name_tokens` (`risk_rules.py:76-88`): split on [\\W_]+, norm
    each piece, drop empties / ignore tokens / tokens shorter than
    min_len."""
    raw = F.split(F.coalesce(value, F.lit("")), r"[\W_]+")
    toks = F.transform(raw, _norm_token)
    return F.filter(
        toks,
        lambda t: (t != "")
        & ~t.isin(*NAME_IGNORE_TOKENS)
        & (F.length(t) >= min_len),
    )


def _words(value: Column) -> Column:
    # the handle-token splitters use \W+ (underscore SURVIVES the
    # split, unlike _name_tokens' [\W_]+) — risk_rules.py:118,127
    return F.filter(
        F.split(F.coalesce(value, F.lit("")), r"\W+"), lambda w: w != ""
    )


def _company_handle_tokens(company: Column) -> Column:
    """`_company_handle_tokens` (`risk_rules.py:117-126`): the full
    normalized name plus the first two words concatenated (or the
    first word alone), each kept only at >= 4 chars."""
    w = _words(company)
    full = _norm_token(company)
    second = F.when(
        F.size(w) >= 2, _norm_token(F.concat(F.get(w, 0), F.get(w, 1)))
    ).otherwise(_norm_token(F.get(w, 0)))
    return F.array_distinct(
        F.filter(
            F.array(full, second),
            lambda t: t.isNotNull() & (F.length(t) >= 4),
        )
    )


def _person_handle_tokens(name: Column) -> Column:
    """`_person_handle_tokens` (`risk_rules.py:129-139`): full name,
    first-two / last-two word concatenations, first word, last word —
    each kept only at >= 3 chars."""
    w = _words(name)
    n = F.size(w)
    full = _norm_token(name)
    first = _norm_token(F.get(w, 0))
    last = _norm_token(F.get(w, n - 1))
    first2 = F.when(n >= 2, _norm_token(F.concat(F.get(w, 0), F.get(w, 1))))
    last2 = F.when(n >= 2, _norm_token(F.concat(F.get(w, n - 2), F.get(w, n - 1))))
    return F.array_distinct(
        F.filter(
            F.array(full, first2, last2, first, last),
            lambda t: t.isNotNull() & (F.length(t) >= 3),
        )
    )


def publisher_matches_company(company: Column, publisher: Column) -> Column:
    """`_publisher_matches_company` (`risk_rules.py:91-116`): exact
    normalized-name match; multi-token company fully contained in the
    publisher tokens; or single-token brand with a known publisher
    suffix (AcmeNews, AcmePress, ...)."""
    brand = _norm_token(F.coalesce(company, F.lit("")))
    pub = _norm_token(F.coalesce(publisher, F.lit("")))
    exact = (brand != "") & (brand == pub)
    ct = _name_tokens(company, 4)
    pt = _name_tokens(publisher, 3)
    subset = (F.size(ct) >= 2) & (F.size(F.array_except(ct, pt)) == 0)
    suffix = F.substring(pub, F.length(brand) + 1, F.length(pub))
    single = (
        (F.size(ct) == 1)
        & (brand != "")
        & (
            (pub == brand)
            | (
                pub.startswith(brand)
                & (suffix != "")
                & suffix.isin(*PUBLISHER_SUFFIX_TOKENS)
            )
        )
    )
    return exact | subset | single


def _stripped_path(url: Column) -> Column:
    """Parsed path with leading/trailing slashes stripped — the
    reference's `path.strip('/')` over every slug matcher."""
    p = F.coalesce(F.parse_url(F.trim(url), F.lit("PATH")), F.lit(""))
    return F.regexp_replace(p, r"^/+|/+$", "")


def _is_brand_youtube_channel(company: Column, host: Column, p: Column) -> Column:
    """`_is_brand_youtube_channel` (`risk_rules.py:141-163`): exact
    youtube.com / m.youtube.com host, slug = remainder after 'user/'
    or '@' (slashes and all — _norm_token erases them) else the first
    path segment; brand token contained in the slug token."""
    brand = _norm_token(company)
    slug = (
        F.when(F.lower(p).startswith("user/"), F.substring(p, F.lit(6), F.length(p)))
        .when(p.startswith("@"), F.substring(p, F.lit(2), F.length(p)))
        .otherwise(F.split_part(p, F.lit("/"), F.lit(1)))
    )
    st = _norm_token(slug)
    return (
        host.isin("youtube.com", "m.youtube.com")
        & (brand != "")
        & (p != "")
        & (st != "")
        & st.contains(brand)
    )


def _linkedin_slug_overlap(company: Column, slug: Column) -> Column:
    """`_linkedin_slug_matches_company` (`risk_rules.py:185-201`):
    any company token (>=4, ignore-list dropped) substring-matches any
    slug token (>=3) in either direction."""
    ct = _name_tokens(company, 4)
    st = F.filter(
        F.transform(F.split(F.lower(F.coalesce(slug, F.lit(""))), r"[\W_]+"), _norm_token),
        lambda t: (t != "") & (F.length(t) >= 3),
    )
    return (
        (F.size(ct) > 0)
        & (F.size(st) > 0)
        & F.exists(ct, lambda c: F.exists(st, lambda s: c.contains(s) | s.contains(c)))
    )


def _is_linkedin_company_page(company: Column, host: Column, p: Column) -> Column:
    """`_is_linkedin_company_page` (`risk_rules.py:165-183`): exact
    linkedin.com host, company/<slug> path; brand token in the slug
    token, else the token-overlap match."""
    slug = F.split_part(p, F.lit("/"), F.lit(2))
    brand = _norm_token(company)
    st = _norm_token(slug)
    return (
        (host == "linkedin.com")
        & F.lower(p).startswith("company/")
        & (slug != "")
        & (((brand != "") & st.contains(brand)) | _linkedin_slug_overlap(company, slug))
    )


def _is_linkedin_person_profile(name: Column, host: Column, p: Column) -> Column:
    """`_is_linkedin_person_profile` (`risk_rules.py:204-225`): exact
    linkedin.com host, in/<slug> or pub/<slug> path; any person handle
    token contained in the slug token."""
    slug = F.split_part(p, F.lit("/"), F.lit(2))
    st = _norm_token(slug)
    return (
        (host == "linkedin.com")
        & (F.lower(p).startswith("in/") | F.lower(p).startswith("pub/"))
        & (st != "")
        & F.exists(_person_handle_tokens(name), lambda t: st.contains(t))
    )


def _x_handle_matches(tokens: Column, host: Column, p: Column) -> Column:
    """`_is_x_company_handle` / `_is_x_person_handle`
    (`risk_rules.py:228-265`): first path segment as the handle; any
    token contained in the handle token."""
    ht = _norm_token(F.split_part(p, F.lit("/"), F.lit(1)))
    return (
        host.isin("x.com", "twitter.com")
        & (ht != "")
        & F.exists(tokens, lambda t: ht.contains(t))
    )


def classify_control(
    company: Column,
    url: Column,
    entity_type: Column,
    person_name: Column | None = None,
    publisher: Column | None = None,
    company_domains: Column | None = None,
) -> Column:
    """Boolean controlled/uncontrolled classification — the FULL
    `src/risk_rules.py:284-346` rule chain, in the reference's exact
    order: publisher match, empty host, ceo-uncontrolled domains, ceo
    person-profile/handle checks, facebook/instagram/threads
    post-vs-page paths, brand YouTube channel, LinkedIn company page,
    X /status/ posts, X company handle, always-controlled domains,
    registered company domains, brand-token-in-host.

    `person_name` (ceo checks), `publisher`, and `company_domains`
    (array<string> of the company's registered domains —
    `parse_company_domains`, `risk_rules.py:267-281`) are optional
    columns; omitted legs evaluate exactly as the reference does when
    the corresponding argument is absent/empty."""
    host = hostname(url)
    p = _stripped_path(url)
    path = F.lower(F.coalesce(F.parse_url(F.trim(url), F.lit("PATH")), F.lit("")))
    brand = _norm_token(company)
    host_parts = F.split(host, r"\.")
    # brand token among the non-TLD host labels (parts[:-1])
    brand_in_host = F.exists(
        F.slice(host_parts, 1, F.greatest(F.size(host_parts) - 1, F.lit(0))),
        lambda part: (_norm_token(part) == brand) & (brand != ""),
    )
    ceo_uncontrolled = F.lit(False)
    for d in CEO_UNCONTROLLED_DOMAINS:
        ceo_uncontrolled = ceo_uncontrolled | _host_matches(host, d)
    always_controlled = F.lit(False)
    for d in ALWAYS_CONTROLLED_DOMAINS:
        always_controlled = always_controlled | _host_matches(host, d)

    is_ceo = entity_type == "ceo"
    pub_match = (
        publisher_matches_company(company, publisher)
        if publisher is not None
        else F.lit(False)
    )
    person_match = (
        (
            _is_linkedin_person_profile(person_name, host, p)
            | _x_handle_matches(_person_handle_tokens(person_name), host, p)
        )
        if person_name is not None
        else F.lit(False)
    )
    domain_match = (
        F.exists(
            F.coalesce(company_domains, F.array().cast("array<string>")),
            lambda d: (host == d) | host.endswith(F.concat(F.lit("."), d)),
        )
        if company_domains is not None
        else F.lit(False)
    )

    fb_post = (host == "facebook.com") & path.rlike("/posts/|/photos/|/videos/")
    ig_post = (host == "instagram.com") & path.rlike("/p/|/reels/")
    th_post = (host == "threads.net") & path.contains("/posts/")
    x_status = host.isin("x.com", "twitter.com") & path.contains("/status/")
    x_company = _x_handle_matches(_company_handle_tokens(company), host, p)

    return (
        F.when(pub_match, F.lit(True))
        .when(host == "", F.lit(False))
        .when(is_ceo & ceo_uncontrolled, F.lit(False))
        .when(is_ceo & person_match, F.lit(True))
        .when(fb_post | ig_post | th_post, F.lit(False))
        .when(
            host.isin("facebook.com", "instagram.com", "threads.net"), F.lit(True)
        )
        .when(_is_brand_youtube_channel(company, host, p), F.lit(True))
        .when(_is_linkedin_company_page(company, host, p), F.lit(True))
        .when(x_status, F.lit(False))
        .when(x_company, F.lit(True))
        .when(always_controlled, F.lit(True))
        .when(domain_match, F.lit(True))
        .when(brand_in_host, F.lit(True))
        # The reference's final CEO controlled-path rule
        # (risk_rules.py:345-346) returns matched_company_domain or
        # brand-in-host — both already returned True above, so the
        # branch is unreachable; kept out as dead code.
        .otherwise(F.lit(False))
    )


def is_financial_routine(title: Column, source_host: Column) -> Column:
    """`src/risk_rules.py:351-358`: finance regex on the text, a
    ticker mention (NYSE/NASDAQ/AMEX: SYM), or a known finance source
    host."""
    finance_sources = [
        "yahoo.com", "marketwatch.com", "fool.com", "benzinga.com",
        "seekingalpha.com", "thefly.com", "barrons.com", "wsj.com",
        "investorplace.com", "nasdaq.com", "foolcdn.com",
        "primaryignition.com", "tradingview.com", "marketscreener.com",
        "gurufocus.com",
    ]
    src_match = F.lit(False)
    for d in finance_sources:
        src_match = src_match | _host_matches(source_host, d)
    return title.rlike(FINANCE_TERMS_RE) | title.rlike(TICKER_RE) | src_match


def has_material_risk_terms(title: Column) -> Column:
    """`src/risk_rules.py:361-363`."""
    return title.rlike(MATERIAL_RISK_TERMS_RE)


def should_neutralize_finance_routine(
    sentiment: Column, title: Column, source_host: Column
) -> Column:
    """`src/risk_rules.py:366-381`: neutralize routine finance noise
    unless material-risk terms appear."""
    return (
        sentiment.isin("positive", "negative")
        & is_financial_routine(title, source_host)
        & ~has_material_risk_terms(title)
    )

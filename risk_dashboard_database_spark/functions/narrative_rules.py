"""Narrative tag classification — the reference's FULL regex surface.

Ports `dashboard_app/narrative_runtime.py:35-219` verbatim: all 30
compiled regex families — the 16 LOW_PRIORITY_* suppressor patterns
(`:56-143`) and the 14 tag matchers / excludes (`:145-219`) — plus the
classification control flow of `is_low_priority_business_story`
(`:326-340`) and `classify_narrative_tags` (`:366-445`), as pure
JVM-side column expressions (one rlike per family, no Python UDFs).

Two tag orders matter and they are NOT the same (the pre-r14 condensed
port conflated them):

- item-level PRIMARY tag = first match in the classify APPEND order
  (`narrative_runtime.py:384-404`): crisis = Fraud, Data Breaches,
  CEO Departures, Workforce Reductions, Labor Disputes, Accidents &
  Disasters, Activist Investor Interest, Unforced Errors, Legal &
  Regulatory; non-crisis = Rebranding, Mergers and acquisitions,
  Planned Executive Turnover. ANY crisis match beats every non-crisis
  match ("a headline matching both Fraud and Workforce is Fraud");
- rollup vote tie-break = the canonical NARRATIVE_TAG_ORDER
  (`narrative_runtime.py:8-33`), which lives in plans/narrative.py as
  TAG_ORDER (Workforce first) — used only to break vote-count ties.

The suppressors change real-headline behavior materially: a PURE
workforce-reduction story ("massive layoffs announced") is
low-priority routine business news and gets NO tag unless a crisis
blocker or legal-enforcement term co-occurs
(`narrative_runtime.py:281-287`); same for tariff-lawsuit, product
delay, fee-cut, debt-refinancing, and store-closure stories.

Haystack subtlety, mirrored exactly: `classify_narrative_tags` joins
[title, snippet, source, url] with single spaces INCLUDING empty parts
(`:380`), while `_low_priority_haystack` skips empty parts (`:262-268`)
— the two differ on cross-field phrase matches when a middle field is
empty, so both forms are built here.

Case-insensitivity note: Java's (?i) is ASCII-case-insensitive while
Python's re.IGNORECASE folds Unicode; every pattern below is pure
ASCII, so the two agree on any input (a non-ASCII letter matches no
pattern either way).

Performance: callers on the corpus path must bind each family flag to
a column in a select() BEFORE combining (``family_flags`` +
``*_from_flags``) — codegen does not common-subexpression-eliminate
repeated rlikes, and the crisis-blocker family alone appears in six
suppressor combinations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------
# Pattern text, verbatim from narrative_runtime.py (re.IGNORECASE in
# the reference == the (?i) prefix applied at match time here).

# narrative_runtime.py:35-54 (LAYOFF_TERMS + WORKFORCE_REDUCTION_TERMS)
LAYOFF_TERMS = [
    r"\blayoff(s)?\b",
    r"\blays?\s+off\b",
    r"\blaid\s+off\b",
]
WORKFORCE_REDUCTION_TERMS = [
    *LAYOFF_TERMS,
    r"\bjob cuts?\b",
    r"\bworkforce reduction(?:s)?\b",
    r"\bworkforce cuts?\b",
    r"\bheadcount reduction(?:s)?\b",
    r"\bstaff reduction(?:s)?\b",
    r"\brestructuring plan\b",
    r"\bdownsiz(?:e|ing)\b",
    r"\bright[- ]siz(?:e|ing)\b",
    r"\bredundanc(?:y|ies)\b",
    r"\bfurlough(?:s|ed|ing)?\b",
    r"\bposition eliminations?\b",
]
WORKFORCE_REDUCTION = "|".join(WORKFORCE_REDUCTION_TERMS)

# narrative_runtime.py:56-68
LOW_PRIORITY_CRISIS_BLOCKER = (
    r"\b(data breach(?:es)?|cyber(?:attack|attacks|breach|breaches)|ransomware|"
    r"hack(?:ed|s|ing)?|fraud|embezzl(?:e|ement)|briber(?:y|ies)|corruption|"
    r"indict(?:ed|ment|ments)?|guilty|convicted|subpoena(?:s)?|charge(?:d|s)?|"
    r"chapter\s+11|bankrupt(?:cy|cies)|default(?:s|ed|ing)?|insolven(?:t|cy)|"
    r"delinquen(?:t|cy)|miss(?:es|ed|ing)\s+payments?|fatal(?:ity|ities)|"
    r"death(?:s)?|killed|injur(?:y|ies)|explosion(?:s)?|fire(?:s)?|crash(?:es|ed)?|"
    r"collapse(?:d|s)?|contamination|chemical spill|oil spill|gas leak|"
    r"toxic release|hazmat|recall(?:s|ed|ing)?)\b"
)
# narrative_runtime.py:69-74
LOW_PRIORITY_LEGAL_ENFORCEMENT = (
    r"\b(class[- ]action|lawsuit(?:s)?|legal action|attorney general|sec\b|doj\b|"
    r"ftc\b|cfpb\b|eeoc\b|nlrb\b|investigat(?:e|es|ed|ing|ion)|probe(?:s|d)?|"
    r"unlawful(?:ly)?|illegal(?:ly)?|discrimination|retaliation)\b"
)
# narrative_runtime.py:75-80
LOW_PRIORITY_TARIFF_CONTEXT = (
    r"\b(tariff(?:s)?|trade dispute(?:s)?|trade war|trade polic(?:y|ies)|"
    r"import dut(?:y|ies)|customs dut(?:y|ies)|trade barrier(?:s)?|"
    r"import lev(?:y|ies))\b"
)
# narrative_runtime.py:81-85
LOW_PRIORITY_TARIFF_LEGAL = (
    r"\b(lawsuit(?:s)?|legal action|sue(?:s|d|ing)?|court challenge|"
    r"complaint(?:s)?|petition(?:s|ed|ing)?|appeal(?:s|ed|ing)?)\b"
)
# narrative_runtime.py:86-91
LOW_PRIORITY_TARIFF_BLOCKER = (
    r"\b(class[- ]action|attorney general|sec\b|doj\b|ftc\b|cfpb\b|epa\b|fda\b|"
    r"osha\b|eeoc\b|nlrb\b|investigat(?:e|es|ed|ing|ion)|probe(?:s|d)?|"
    r"misconduct|antitrust|sanction(?:s|ed)?|penalt(?:y|ies))\b"
)
# narrative_runtime.py:92-96
LOW_PRIORITY_DELAY_ACTION = (
    r"\b(delay(?:s|ed|ing)?|postpon(?:e|es|ed|ing|ement)|"
    r"push(?:es|ed|ing)?\s+back|slipp(?:ed|ing|age))\b"
)
# narrative_runtime.py:97-100
LOW_PRIORITY_DELAY_CONTEXT = (
    r"\b(ai chip(?:s)?|chip(?:s)?|semiconductor(?:s)?|robotaxi|launch|rollout|"
    r"release|production|product roadmap|timeline|platform|model(?:s)?|program)\b"
)
# narrative_runtime.py:101-105
LOW_PRIORITY_DELAY_BLOCKER = (
    r"\b(recall(?:s|ed|ing)?|safety|fatal(?:ity|ities)|death(?:s)?|injur(?:y|ies)|"
    r"fda\b|osha\b)\b"
)
# narrative_runtime.py:106-109
LOW_PRIORITY_FEE_CONTEXT = (
    r"\b(commission(?: fee)?s?|app store (?:fee|fees|commission)|take rate|"
    r"developer fee(?:s)?|marketplace fee(?:s)?|platform fee(?:s)?)\b"
)
# narrative_runtime.py:110-114
LOW_PRIORITY_FEE_ACTION = (
    r"\b(reduc(?:e|es|ed|ing)|cut(?:s|ting)?|lower(?:s|ed|ing)|"
    r"slash(?:es|ed|ing)?|trim(?:s|med|ming))\b"
)
# narrative_runtime.py:115-118
LOW_PRIORITY_DEBT_CONTEXT = (
    r"\b(debt|notes?|bonds?|maturit(?:y|ies)|credit facility|term loan|"
    r"capital structure|liabilit(?:y|ies) management|debt exchange|exchange offer)\b"
)
# narrative_runtime.py:119-124
LOW_PRIORITY_DEBT_ACTION = (
    r"\b(refinanc(?:e|es|ed|ing)|exchange(?:s|d|ing)?|extend(?:s|ed|ing)?|"
    r"reduce(?:s|d|ing)?|repay(?:s|ment|ing)?|retir(?:e|es|ed|ing)|"
    r"issu(?:e|es|ed|ing)|offer(?:s|ed|ing)?|amend(?:s|ed|ing)?|swap(?:s|ped|ping)?)\b"
)
# narrative_runtime.py:125-130
LOW_PRIORITY_DEBT_BLOCKER = (
    r"\b(default(?:s|ed|ing)?|distress(?:ed)?|delinquen(?:t|cy)|insolven(?:t|cy)|"
    r"bankrupt(?:cy|cies)|chapter\s+11|miss(?:es|ed|ing)\s+payments?|"
    r"restructuring support agreement)\b"
)
# narrative_runtime.py:131-136
LOW_PRIORITY_STORE_CONTEXT = (
    r"\b(store(?:s)?|location(?:s)?|restaurant(?:s)?|branch(?:es)?|outlet(?:s)?|"
    r"shop(?:s)?|office(?:s)?|club(?:s)?|pharmacies|pharmacy|retail locations?)\b"
)
# narrative_runtime.py:137-140
LOW_PRIORITY_STORE_ACTION = r"\bclos(?:e|es|ed|ing|ure|ures)\b"

# narrative_runtime.py:145-148
NARRATIVE_REBRANDING = (
    r"\b(rebrand(?:ing|ed|s)?|brand refresh|new logo|renam(?:e|ed|ing)|"
    r"new brand identity|brand overhaul)\b"
)
# narrative_runtime.py:149-152
NARRATIVE_MNA = (
    r"\b(merger(?:s)?|acquisition(?:s)?|acquire(?:d|s|ing)?|buyout|takeover|"
    r"merge(?:s|d|r|ing)?|spinoff|spin-off)\b"
)
# narrative_runtime.py:153-157
NARRATIVE_PLANNED_EXEC = (
    r"\b(retire(?:s|d|ment|ing)?|succession plan(?:ning)?|planned succession|"
    r"planned transition|"
    r"step(?:ping)? down|to step down|will step down|named successor|successor)\b"
)
# narrative_runtime.py:158-162
NARRATIVE_PLANNED_EXEC_EXCLUDE = (
    r"\b(fired|firing|ousted|forced out|amid|scandal|probe|"
    r"investigat(?:e|es|ed|ing|ion)|"
    r"lawsuit|indict(?:ed|ment)?|charged|fraud|misconduct)\b"
)
# narrative_runtime.py:163 — NARRATIVE_WORKFORCE_RE reuses the
# workforce-reduction terms verbatim.
NARRATIVE_WORKFORCE = WORKFORCE_REDUCTION
# narrative_runtime.py:164-170
NARRATIVE_ACCIDENT = (
    r"\b(accident(?:s)?|explosion(?:s)?|fire(?:s)?|disaster(?:s)?|fatal(?:ity|ities)|"
    r"injur(?:y|ies)|crash(?:es|ed)?|derailment|collapse(?:d|s)?|plant incident|"
    r"chemical spill|oil spill|gas leak|toxic release|hazmat|contamination|"
    r"industrial incident|site shutdown|evacuat(?:e|ed|ion))\b"
)
# narrative_runtime.py:171-177
NARRATIVE_DATA_BREACH = (
    r"\b(data breach(?:es)?|cyber(?:attack|attacks)|ransomware|hack(?:ed|s|ing)?|"
    r"security breach(?:es)?|data leak(?:s|ed|ing)?|expos(?:e|ed|ure|ing)|"
    r"unauthori[sz]ed access|stolen data|compromised (?:accounts?|systems?|credentials)|"
    r"malware|phishing|ddos|privacy incident|zero[- ]day|vulnerabilit(?:y|ies))\b"
)
# narrative_runtime.py:178-184
NARRATIVE_ACTIVIST_INVESTOR = (
    r"\b(activist investor(?:s)?|activist hedge fund(?:s)?|proxy (?:fight|battle|contest)|"
    r"dissident shareholder(?:s)?|board seat(?:s)?|board representation|"
    r"nominat(?:e|es|ed|ing) (?:director|directors)|shareholder campaign|campaign letter|"
    r"schedule 13d|13d filing|push(?:ing)? for (?:a sale|breakup|spin-?off|board changes?))\b"
)
# narrative_runtime.py:185-192
NARRATIVE_LEGAL = (
    r"\b(attorney general|lawsuit(?:s)?|legal action|regulator(?:y)?|regulatory|"
    r"investigat(?:e|es|ed|ing|ion)|probe(?:s|d)?|settle(?:ment|s|d|ing)?|fine(?:d|s|ing)?|"
    r"charged|indict(?:ed|ment)?|class[- ]action|subpoena(?:s)?|consent (?:order|decree)|"
    r"injunction|violat(?:ion|ions)|non[- ]compliance|sec\b|doj\b|ftc\b|cfpb\b|"
    r"epa\b|fda\b|osha\b|eeoc\b|nlrb\b|cpsc\b)\b"
)
# narrative_runtime.py:193-199
NARRATIVE_UNFORCED = (
    r"\b(backlash|boycott(?:s|ed|ing)?|tone[- ]deaf|ad campaign|advertising campaign|"
    r"public apology|apolog(?:y|ies|ize|ized|izing)|controversial comment(?:s)?|"
    r"executive comment(?:s)?|social media post|pr disaster|gaffe|offensive (?:remark|remarks|post)|"
    r"insensitive (?:remark|remarks|post)|walked back|deleted post|viral backlash)\b"
)
# narrative_runtime.py:200-205
NARRATIVE_LABOR = (
    r"\b(strike(?:s|d|ing)?|walkout(?:s)?|labor dispute(?:s)?|union dispute(?:s)?|"
    r"picket(?:ing)?|collective bargaining|contract talks?|lockout(?:s)?|work stoppage(?:s)?|"
    r"unionization drive|organizing drive|unfair labor practice(?:s)?|nlrb charge(?:s)?|contract impasse)\b"
)
# narrative_runtime.py:206-212
NARRATIVE_CEO_DEPART = (
    r"\b(ceo\s+(?:resign(?:s|ed|ing|ation)?|step(?:s|ped)? down|depart(?:s|ed|ure)|"
    r"fired|ouste?d|removed)|chief executive\s+(?:resign(?:s|ed|ing|ation)?|step(?:s|ped)? down|"
    r"fired|ouste?d|removed)|resign(?:s|ed|ing|ation)? as ceo|ouste?d ceo|fired ceo)\b"
)
# narrative_runtime.py:213-216
NARRATIVE_CEO_DEPART_EXCLUDE = (
    r"\b(retire(?:s|d|ment|ing)?|succession plan(?:ning)?|planned succession|"
    r"planned transition|named successor|interim ceo)\b"
)
# narrative_runtime.py:217-222
NARRATIVE_FRAUD = (
    r"\b(fraud|embezzl(?:e|ed|ing|ement)|briber(?:y|ies)|corruption|ponzi|accounting fraud|"
    r"falsif(?:y|ied|ication)|misappropriation|insider trading|securities fraud|wire fraud|"
    r"mail fraud|money laundering|kickback(?:s)?|tax evasion|false claims|bid rigging)\b"
)

# --------------------------------------------------------------------
# Family registry: every regex family by short name. Suppressor
# families match against the low-priority haystack (empty parts
# skipped), tag families against the classify haystack (empty parts
# kept) — the reference's two haystack builders.

SUPPRESSOR_FAMILIES: dict[str, str] = {
    "lp_crisis_blocker": LOW_PRIORITY_CRISIS_BLOCKER,
    "lp_legal_enforcement": LOW_PRIORITY_LEGAL_ENFORCEMENT,
    "lp_tariff_context": LOW_PRIORITY_TARIFF_CONTEXT,
    "lp_tariff_legal": LOW_PRIORITY_TARIFF_LEGAL,
    "lp_tariff_blocker": LOW_PRIORITY_TARIFF_BLOCKER,
    "lp_delay_action": LOW_PRIORITY_DELAY_ACTION,
    "lp_delay_context": LOW_PRIORITY_DELAY_CONTEXT,
    "lp_delay_blocker": LOW_PRIORITY_DELAY_BLOCKER,
    "lp_fee_context": LOW_PRIORITY_FEE_CONTEXT,
    "lp_fee_action": LOW_PRIORITY_FEE_ACTION,
    "lp_debt_context": LOW_PRIORITY_DEBT_CONTEXT,
    "lp_debt_action": LOW_PRIORITY_DEBT_ACTION,
    "lp_debt_blocker": LOW_PRIORITY_DEBT_BLOCKER,
    "lp_store_context": LOW_PRIORITY_STORE_CONTEXT,
    "lp_store_action": LOW_PRIORITY_STORE_ACTION,
    "lp_workforce": WORKFORCE_REDUCTION,
}
TAG_FAMILIES: dict[str, str] = {
    "rebranding": NARRATIVE_REBRANDING,
    "mna": NARRATIVE_MNA,
    "planned_exec": NARRATIVE_PLANNED_EXEC,
    "planned_exec_exclude": NARRATIVE_PLANNED_EXEC_EXCLUDE,
    "workforce": NARRATIVE_WORKFORCE,
    "accident": NARRATIVE_ACCIDENT,
    "data_breach": NARRATIVE_DATA_BREACH,
    "activist": NARRATIVE_ACTIVIST_INVESTOR,
    "legal": NARRATIVE_LEGAL,
    "unforced": NARRATIVE_UNFORCED,
    "labor": NARRATIVE_LABOR,
    "ceo_depart": NARRATIVE_CEO_DEPART,
    "ceo_depart_exclude": NARRATIVE_CEO_DEPART_EXCLUDE,
    "fraud": NARRATIVE_FRAUD,
}

# classify_narrative_tags append order (`narrative_runtime.py:384-404`):
# (tag, match flag, exclude flag or None). Crisis beats non-crisis.
CLASSIFY_CRISIS_ORDER: list[tuple[str, str, str | None]] = [
    ("Fraud", "fraud", None),
    ("Data Breaches", "data_breach", None),
    ("CEO Departures (firings, resignations)", "ceo_depart", "ceo_depart_exclude"),
    ("Workforce Reductions", "workforce", None),
    ("Labor Disputes", "labor", None),
    ("Accidents & Disasters", "accident", None),
    ("Activist Investor Interest", "activist", None),
    ("Unforced Errors", "unforced", None),
    ("Legal & Regulatory", "legal", None),
]
CLASSIFY_NON_CRISIS_ORDER: list[tuple[str, str, str | None]] = [
    ("Rebranding", "rebranding", None),
    ("Mergers and acquisitions", "mna", None),
    ("Planned Executive Turnover", "planned_exec", "planned_exec_exclude"),
]


def _blank_to_empty(c: Column | None) -> Column:
    return F.coalesce(c, F.lit("")) if c is not None else F.lit("")


def low_priority_haystack(
    title: Column,
    snippet: Column | None = None,
    url: Column | None = None,
    source: Column | None = None,
) -> Column:
    """`_low_priority_haystack` (`narrative_runtime.py:262-268`):
    non-empty parts joined with single spaces, order title, snippet,
    source, url."""
    parts = F.array(
        _blank_to_empty(title),
        _blank_to_empty(snippet),
        _blank_to_empty(source),
        _blank_to_empty(url),
    )
    return F.trim(F.array_join(F.filter(parts, lambda p: p != ""), " "))


def classify_haystack(
    title: Column,
    snippet: Column | None = None,
    url: Column | None = None,
    source: Column | None = None,
) -> Column:
    """`classify_narrative_tags`'s hay (`narrative_runtime.py:380`):
    ALL four parts joined with single spaces (empty parts keep their
    separator, so 'data' + '' + 'breach' does NOT bridge into
    'data breach' here — unlike the low-priority haystack)."""
    return F.trim(
        F.concat_ws(
            " ",
            _blank_to_empty(title),
            _blank_to_empty(snippet),
            _blank_to_empty(source),
            _blank_to_empty(url),
        )
    )


def family_flags(
    title: Column,
    snippet: Column | None = None,
    url: Column | None = None,
    source: Column | None = None,
) -> dict[str, Column]:
    """One boolean Column per regex family (ONE rlike each), plus the
    two empty-haystack guards. Corpus-path callers must bind these in
    a select() before combining with the ``*_from_flags`` helpers —
    codegen does not CSE repeated rlikes, and lp_crisis_blocker alone
    feeds six suppressor combinations."""
    lp_hay = low_priority_haystack(title, snippet, url, source)
    cl_hay = classify_haystack(title, snippet, url, source)
    flags: dict[str, Column] = {
        name: lp_hay.rlike("(?i)" + pat)
        for name, pat in SUPPRESSOR_FAMILIES.items()
    }
    flags.update(
        {
            name: cl_hay.rlike("(?i)" + pat)
            for name, pat in TAG_FAMILIES.items()
        }
    )
    flags["hay_empty"] = cl_hay == ""
    return flags


def suppressed_from_flags(fl: dict[str, Column]) -> Column:
    """`is_low_priority_business_story` (`narrative_runtime.py:326-340`)
    over pre-bound family flags: the six suppressor combinations
    (`:271-323`), any of which marks the story routine business news."""
    blocker = fl["lp_crisis_blocker"]
    enforce = fl["lp_legal_enforcement"]
    tariff = (
        fl["lp_tariff_context"]
        & fl["lp_tariff_legal"]
        & ~fl["lp_tariff_blocker"]
        & ~blocker
    )
    workforce = fl["lp_workforce"] & ~blocker & ~enforce
    delay = (
        fl["lp_delay_action"]
        & fl["lp_delay_context"]
        & ~fl["lp_delay_blocker"]
        & ~blocker
    )
    fee = fl["lp_fee_action"] & fl["lp_fee_context"] & ~blocker
    debt = (
        fl["lp_debt_action"]
        & fl["lp_debt_context"]
        & ~fl["lp_debt_blocker"]
        & ~blocker
    )
    store = fl["lp_store_action"] & fl["lp_store_context"] & ~blocker & ~enforce
    return ~fl["hay_empty"] & (tariff | workforce | delay | fee | debt | store)


def _tag_hits(
    fl: dict[str, Column], order: list[tuple[str, str, str | None]]
) -> list[tuple[str, Column]]:
    hits = []
    for tag, flag, exclude in order:
        cond = fl[flag]
        if exclude is not None:
            cond = cond & ~fl[exclude]
        hits.append((tag, cond))
    return hits


def crisis_tags_from_flags(fl: dict[str, Column]) -> Column:
    """array<string> of matched crisis tags in classify append order."""
    return F.array_compact(
        F.array(
            *[
                F.when(cond, F.lit(tag))
                for tag, cond in _tag_hits(fl, CLASSIFY_CRISIS_ORDER)
            ]
        )
    )


def non_crisis_tags_from_flags(fl: dict[str, Column]) -> Column:
    """array<string> of matched non-crisis tags in classify append order."""
    return F.array_compact(
        F.array(
            *[
                F.when(cond, F.lit(tag))
                for tag, cond in _tag_hits(fl, CLASSIFY_NON_CRISIS_ORDER)
            ]
        )
    )


def primary_tag_from_flags(fl: dict[str, Column]) -> Column:
    """`classify_narrative_tags` primary selection with
    allow_other_fallback=False (`narrative_runtime.py:406-437`): NULL
    when the haystack is empty, a suppressor fires, or nothing
    matches; else the first crisis tag in append order, else the first
    non-crisis tag. (The 'Other' fallback is a ROLLUP-level decision —
    `rollup_entity_day_narrative:520-531` — and lives with the vote.)"""
    primary = F.coalesce(
        F.get(crisis_tags_from_flags(fl), 0),
        F.get(non_crisis_tags_from_flags(fl), 0),
    )
    return F.when(
        fl["hay_empty"] | suppressed_from_flags(fl),
        F.lit(None).cast("string"),
    ).otherwise(primary)


def classify_narrative(
    title: Column,
    snippet: Column | None = None,
    url: Column | None = None,
    source: Column | None = None,
) -> Column:
    """Single-expression convenience form (tests / small relations):
    struct(primary_tag, primary_group, tags, is_crisis) mirroring
    `classify_narrative_tags` with allow_other_fallback=False. The
    corpus path should use family_flags + *_from_flags with a binding
    select instead (see module doc)."""
    fl = family_flags(title, snippet, url, source)
    crisis = crisis_tags_from_flags(fl)
    non_crisis = non_crisis_tags_from_flags(fl)
    dead = fl["hay_empty"] | suppressed_from_flags(fl)
    has_crisis = F.size(crisis) > 0
    has_any = has_crisis | (F.size(non_crisis) > 0)
    null_s = F.lit(None).cast("string")
    return F.struct(
        F.when(dead, null_s)
        .otherwise(F.coalesce(F.get(crisis, 0), F.get(non_crisis, 0)))
        .alias("primary_tag"),
        F.when(dead | ~has_any, null_s)
        .when(has_crisis, F.lit("crisis"))
        .otherwise(F.lit("non_crisis"))
        .alias("primary_group"),
        F.when(dead, F.array().cast("array<string>"))
        .when(has_crisis, F.concat(crisis, non_crisis))
        .otherwise(non_crisis)
        .alias("tags"),
        F.when(dead | ~has_any, F.lit(None).cast("boolean"))
        .otherwise(has_crisis)
        .alias("is_crisis"),
    )

"""NL time-window resolution (SURVEY §2.11 F6).

Port of `insights agent/period_parser.py:19-167` semantics: explicit
quarters (q3 2025 / 2025 q3 / quarter 3 2025), relative quarters and
months and years (last/this, to-date), rolling N days (clamped
1..365), and keyword fallbacks; rolling windows anchor to the latest
available data date rather than the calendar. Driver-side helper (the
API layer resolves the window, then parametrizes date predicates that
Catalyst prunes partitions with).
"""

from __future__ import annotations

import calendar
import re
from datetime import date, timedelta

_QUARTER_PATTERNS = [
    re.compile(r"\bq([1-4])\s*(20\d{2})\b", re.IGNORECASE),
    re.compile(r"\b(20\d{2})\s*q([1-4])\b", re.IGNORECASE),
    re.compile(r"\bquarter\s*([1-4])\s*(20\d{2})\b", re.IGNORECASE),
]
_ROLLING_RE = re.compile(r"\b(?:rolling|past|last)\s+(\d{1,3})\s+days?\b", re.IGNORECASE)


def quarter_bounds(year: int, quarter: int) -> tuple[date, date]:
    start = date(year, (quarter - 1) * 3 + 1, 1)
    end_month = quarter * 3
    end = date(year, end_month, calendar.monthrange(year, end_month)[1])
    return start, end


def month_bounds(year: int, month: int) -> tuple[date, date]:
    return date(year, month, 1), date(year, month, calendar.monthrange(year, month)[1])


def _calendar(label: str, display: str, start: date, end: date) -> dict:
    return {
        "mode": "calendar",
        "period_label": label,
        "display_label": display,
        "start_date": start.isoformat(),
        "end_date": end.isoformat(),
        "days": (end - start).days + 1,
    }


def _rolling(days: int) -> dict:
    return {
        "mode": "rolling",
        "period_label": f"rolling_{days}_days",
        "display_label": f"rolling {days} days ending on the latest available date",
        "start_date": None,
        "end_date": None,
        "days": days,
    }


def resolve_time_window(text: str, today: date | None = None, default_days: int = 90) -> dict:
    """Resolve a natural-language window request. Precedence mirrors
    the reference exactly: explicit quarter > last/this quarter >
    last/this month > last/this year > rolling-N > keyword fallbacks >
    rolling default."""
    t = (text or "").strip().casefold()
    today = today or date.today()

    for pat in _QUARTER_PATTERNS:
        m = pat.search(t)
        if not m:
            continue
        a, b = int(m.group(1)), int(m.group(2))
        quarter, year = (b, a) if a > 4 else (a, b)
        start, end = quarter_bounds(year, quarter)
        return _calendar(f"q{quarter}_{year}", f"Q{quarter} {year}", start, end)

    if "last quarter" in t or "previous quarter" in t:
        q = (today.month - 1) // 3 + 1
        year, q = (today.year - 1, 4) if q == 1 else (today.year, q - 1)
        start, end = quarter_bounds(year, q)
        return _calendar("last_quarter", f"last quarter (Q{q} {year})", start, end)

    if "this quarter" in t or "current quarter" in t or "quarter to date" in t:
        q = (today.month - 1) // 3 + 1
        start, _ = quarter_bounds(today.year, q)
        return _calendar(
            "this_quarter", f"this quarter to date (Q{q} {today.year})", start, today
        )

    if "last month" in t:
        year, month = (today.year - 1, 12) if today.month == 1 else (today.year, today.month - 1)
        start, end = month_bounds(year, month)
        return _calendar("last_month", f"last month ({start.strftime('%B %Y')})", start, end)

    if "this month" in t or "month to date" in t:
        start, _ = month_bounds(today.year, today.month)
        return _calendar(
            "this_month", f"this month to date ({start.strftime('%B %Y')})", start, today
        )

    if "last year" in t or "previous year" in t:
        y = today.year - 1
        return _calendar("last_year", f"last year ({y})", date(y, 1, 1), date(y, 12, 31))

    if "this year" in t or "year to date" in t:
        return _calendar(
            "this_year", f"this year to date ({today.year})", date(today.year, 1, 1), today
        )

    m = _ROLLING_RE.search(t)
    if m:
        return _rolling(min(max(int(m.group(1)), 1), 365))

    if "today" in t:
        return _rolling(1)
    if "this week" in t or "past week" in t or "last 7 days" in t:
        return _rolling(7)
    if "past month" in t or "last 30 days" in t:
        return _rolling(30)
    if "past quarter" in t or "last 90 days" in t:
        return _rolling(90)
    if "last 365 days" in t:
        return _rolling(365)

    return _rolling(default_days)

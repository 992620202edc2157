"""Date/time scalar helpers with reference semantics — all
locale-independent pure functions (the reference needs
``switch_locale`` hacks, util.py:666-686; a distributed engine cannot
touch process locale, so month names are explicit tables)."""

from __future__ import annotations

import re
from datetime import date, datetime, timezone

_MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
_MONTH_NUM = {m.lower(): i + 1 for i, m in enumerate(_MONTHS)}
_FULL_MONTHS = ("January", "February", "March", "April", "May", "June",
                "July", "August", "September", "October", "November",
                "December")
for _i, _m in enumerate(_FULL_MONTHS):
    _MONTH_NUM[_m.lower()] = _i + 1


def rfc_3339_timestamp(dt: datetime) -> str:
    """datetime → RFC 3339 string (util.py:466-479 semantics);
    naive datetimes are treated as UTC."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    s = dt.isoformat()
    if s.endswith("+00:00"):
        s = s[:-6] + "Z"
    return s


_RFC822 = re.compile(
    r"(?:\w{3},\s*)?(\d{1,2})\s+(\w{3,9})\s+(\d{2,4})"
    r"(?:\s+(\d{1,2}):(\d{2})(?::(\d{2}))?)?")


def parse_rfc822_date(s: str) -> datetime:
    """'Mon, 4 Aug 2013 12:03:10' → datetime (util.py:480-492 shape,
    without email.utils' locale dependence)."""
    m = _RFC822.search(s)
    if not m:
        raise ValueError("not an RFC822 date: %r" % s)
    day, mon, year = int(m.group(1)), m.group(2).lower(), int(m.group(3))
    if mon not in _MONTH_NUM:
        raise ValueError("unknown month in %r" % s)
    if year < 100:
        year += 2000 if year < 70 else 1900
    h = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    sec = int(m.group(6) or 0)
    return datetime(year, _MONTH_NUM[mon], day, h, mi, sec)


_GYEARMONTH = re.compile(r"^(\d{4})-(\d{2})$")


def parse_gyearmonth(s: str) -> date:
    """xsd:gYearMonth ' 2004-08' → date(2004, 8, 1) (the custom
    converter of sources/tech/rfc.py:630-640)."""
    m = _GYEARMONTH.match(s.strip())
    if not m:
        raise ValueError("not a gYearMonth: %r" % s)
    return date(int(m.group(1)), int(m.group(2)), 1)


def parse_month_year(s: str) -> date:
    """'August 2013' / 'Aug 2013' → date(2013, 8, 1) — the
    English-month parse the reference does under switch_locale."""
    parts = s.strip().split()
    if len(parts) != 2:
        raise ValueError("not a 'Month Year' string: %r" % s)
    mon = _MONTH_NUM.get(parts[0].lower())
    if mon is None:
        raise ValueError("unknown month %r" % parts[0])
    return date(int(parts[1]), mon, 1)

"""Pure scalar functions with reference semantics.

Each function re-implements (from its documented behaviour) a scalar
helper of the reference engine; the reference location is cited per
function so parity can be checked. These are used inside vectorized
``map_batches`` bodies — they must be deterministic, locale-independent
pure functions (the reference itself wrestles with process locale;
a distributed engine cannot depend on it).
"""

from __future__ import annotations

import re
from datetime import date, datetime

# --- whitespace ---------------------------------------------------------

def normalize_space(s: str) -> str:
    """Collapse all whitespace runs to single spaces and strip ends.

    Reference semantics: ferenda/util.py:287-297 (``normalize_space``):
    NBSP (U+00A0) is treated as a space, then ``' '.join(s.split())``.
    This function sits on the byte-identity path for extracted text.
    """
    return " ".join(s.replace("\xa0", " ").split())


# --- sort keys ----------------------------------------------------------

_NONWORD = re.compile(r"\W+", re.UNICODE)


def title_sortkey(s: str) -> str:
    """Document title → sort/partition key.

    Reference semantics: ferenda/util.py:724-739: lowercase, strip one
    leading "the ", remove all non-word chars, remove spaces.
    ``title_sortkey("The 'viewstate' property") == "viewstateproperty"``.
    """
    s = s.lower()
    if s.startswith("the "):
        s = s[4:]
    s = _NONWORD.sub("", s)
    return "".join(s.split())


def split_numalpha(s: str) -> list:
    """String → alternating [str, int, str, int, ...] for natural sort.

    Reference semantics: ferenda/util.py:214-242:
    ``split_numalpha('10 a §') == ['', 10, ' a §']`` — decimal runs
    become ints; a leading '' pads lists that start numeric so every
    list alternates str, int, str, ...
    """
    res: list = []
    seg = ""
    if not s:
        return res
    digit = s[0].isdecimal()
    for c in s:
        if (c.isdecimal() and digit) or (not c.isdecimal() and not digit):
            seg += c
        else:
            res.append(int(seg) if seg.isdecimal() else seg)
            seg = c
            digit = not digit
    res.append(int(seg) if seg.isdecimal() else seg)
    if isinstance(res[0], int):
        res.insert(0, "")
    return res


def natsort_key(s: str) -> tuple:
    """split_numalpha as a hashable tuple (Arrow-storable as a string key
    via repr when needed); sorts '2' < '2 a' < '10' like util.numcmp
    (ferenda/util.py:191-211)."""
    return tuple(split_numalpha(s))


# --- URIs ---------------------------------------------------------------

def uri_leaf(uri: str) -> str | None:
    """Fragment id or last path segment of a URI, else None.

    Reference semantics: ferenda/util.py:621-646 — try separators
    '#', '/', ':' in order; a URI *ending* with the separator yields
    None.
    """
    for char in ("#", "/", ":"):
        if uri.endswith(char):
            break
        if char in uri:
            sep = char
            leaf = uri.rsplit(char)[-1]
        else:
            sep = ""
            leaf = uri
        if sep and leaf:
            return leaf
    return None


def slugify(s: str) -> str:
    """Default identificator: lowercase, spaces → '-'.

    Reference semantics: ferenda/facet.py:143-155
    (``Facet.defaultidentificator``)."""
    return s.lower().replace(" ", "-")


# --- facet selectors ----------------------------------------------------

def firstletter(title: str) -> str:
    """First letter of the title sort key, '-' when the key is empty.

    Reference semantics: ferenda/facet.py:203-233 (``Facet.firstletter``).
    """
    key = title_sortkey(title)
    return key[0] if key else "-"


def year_of(d) -> str:
    """Year part of a date / datetime / ISO-ish date string.

    Reference semantics: ferenda/facet.py:158-178 (``Facet.year``) —
    accepts datetime/date or strings of length 19/10/7.
    """
    if not isinstance(d, (datetime, date)):
        fmt = {19: "%Y-%m-%dT%H:%M:%S", 10: "%Y-%m-%d", 7: "%Y-%m"}[len(d)]
        d = datetime.strptime(d, fmt)
    return str(d.year)


def booleanvalue(v) -> bool:
    """True iff v == 'true' (or already a bool).

    Reference semantics: ferenda/facet.py:180-194 (``Facet.booleanvalue``).
    """
    return v if isinstance(v, bool) else v == "true"


# --- roman numerals (ferenda/util.py:689-723) ---------------------------

_ROMAN_MAP = [
    ("M", 1000), ("CM", 900), ("D", 500), ("CD", 400),
    ("C", 100), ("XC", 90), ("L", 50), ("XL", 40),
    ("X", 10), ("IX", 9), ("V", 5), ("IV", 4), ("I", 1),
]
_ROMAN_RE = re.compile(
    "^M{0,4}(CM|CD|D?C{0,3})(XC|XL|L?X{0,3})(IX|IV|V?I{0,3})$"
)


def to_roman(i: int, lower: bool = False) -> str:
    if not 0 < i < 5000:
        raise ValueError("number out of range for roman numerals (1..4999)")
    out = []
    for sym, val in _ROMAN_MAP:
        while i >= val:
            out.append(sym)
            i -= val
    s = "".join(out)
    return s.lower() if lower else s


def from_roman(s: str) -> int:
    s = s.upper()
    if not s or not _ROMAN_RE.match(s):
        raise ValueError("not a roman numeral: %r" % s)
    i, pos = 0, 0
    for sym, val in _ROMAN_MAP:
        while s.startswith(sym, pos):
            i += val
            pos += len(sym)
    return i


def is_roman(s) -> bool:
    if not isinstance(s, str) or len(s) == 0:
        return False
    return _ROMAN_RE.match(s.upper()) is not None


def increment(s, amount: int = 1):
    """'vi' → 'vii', 4 → 5 (ferenda/util.py:712-723)."""
    if is_roman(s):
        lower = s.islower()
        return to_roman(from_roman(s) + amount, lower=lower)
    if not isinstance(s, int):
        raise ValueError("%r is neither a roman numeral nor an int" % (s,))
    return s + amount


# --- base27 (ferenda/util.py:840-849) -----------------------------------
# Reference directions: encode is STRING → int (alphabet
# " abc...z" read as base-27 digits), decode is int → string.

_B27_ALPHABET = " abcdefghijklmnopqrstuvwxyz"


def base27encode(s: str) -> int:
    """' ab' / 'ab' → int (space is the zero digit, util.py:843-845)."""
    i = 0
    for c in s:
        i = i * 27 + _B27_ALPHABET.index(c)
    return i


def base27decode(num: int) -> str:
    """int → base-27 string; leading zero-digits (spaces) stripped,
    num == 0 → ' ' (util.py:847-849)."""
    if num == 0:
        return _B27_ALPHABET[0]
    out = ""
    n = num
    while n:
        n, rem = divmod(n, 27)
        out = _B27_ALPHABET[rem] + out
    return out.lstrip(_B27_ALPHABET[0]) or _B27_ALPHABET[0]

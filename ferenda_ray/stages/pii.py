"""PII detection and redaction for training-data pipelines.

Counts and scrubs personally-identifiable-information patterns
(emails, NANP phone numbers, SSN-shaped ids, IPv4 addresses) from a
text column. All patterns are RE2-compatible (no lookaround, no
backreferences, only non-capturing groups) so a SQL engine's
``regexp_extract_all`` / ``regexp_replace`` recomputes the exact same
matches — the oracle for the ``pii_scan`` query exercises true regex
parity, not arithmetic.

Scale shape: stateless ``map_batches`` — no shuffle at all; counting
and replacement run as pandas vectorized ``str.count`` /
``str.replace`` over each batch. An actor-pool variant
(:class:`PIIScrubber`) compiles the pattern set once per actor for
pipelines that extend it with custom patterns.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

# Ordered: redaction applies top to bottom (email first so its digits
# and dots can never be re-matched as phone/IP fragments).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phone", r"\+1[- ][0-9]{3}[- ][0-9]{3}[- ][0-9]{4}", "<PHONE>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def pii_scan(batch: pa.Table, text_col: str = "text",
             redact: bool = True) -> pd.DataFrame:
    """Per-row PII class counts (columns ``n_<class>``) and, when
    ``redact``, the scrubbed text in ``clean``. Pure map — safe to
    fuse with the read."""
    df = batch.to_pandas()
    s = df[text_col].fillna("")
    for name, pat, _ in PII_PATTERNS:
        df["n_" + name] = s.str.count(pat).astype("int64")
    if redact:
        clean = s
        for _, pat, token in PII_PATTERNS:
            clean = clean.str.replace(pat, token, regex=True)
        df["clean"] = clean
    return df.drop(columns=[text_col])


class PIIScrubber:
    """Actor-pool stage: pattern set (defaults + extras) compiled once
    per actor in ``__init__``; each ``__call__`` scans/redacts one
    batch. Use via ``map_batches(PIIScrubber, fn_constructor_kwargs=
    ..., concurrency=N)`` when the pattern set is large or custom."""

    def __init__(self, text_col: str = "text",
                 extra_patterns: tuple = (), redact: bool = True):
        self.text_col = text_col
        self.redact = redact
        self.compiled = [(name, re.compile(pat), token)
                         for name, pat, token in
                         tuple(PII_PATTERNS) + tuple(extra_patterns)]

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        s = df[self.text_col].fillna("")
        for name, rx, _ in self.compiled:
            df["n_" + name] = s.map(lambda x: len(rx.findall(x))) \
                               .astype("int64")
        if self.redact:
            clean = s
            for _, rx, token in self.compiled:
                clean = clean.map(lambda x: rx.sub(token, x))
            df["clean"] = clean
        return df.drop(columns=[self.text_col])

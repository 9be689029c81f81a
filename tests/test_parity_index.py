"""Mechanize the PARITY.md gate-index invariant (round-4 verdict item 2).

The invariant (stated at the top of docs/PARITY.md): every parity data file
under docs/parity_data/ appears exactly once in the gate index, and every
index row's file pattern matches at least one existing file. It exists
because a failing parity verdict was once committed without disclosure
(round-3 LightGCN run); until now nothing would break if that happened
again — the invariant was enforced by habit. This test makes a silently
unindexed parity run impossible: land a new file under docs/parity_data/
without an index row (or delete a file whose row remains) and the suite
goes red.

Index grammar understood here (the formats PARITY.md actually uses):
  * exact stems:      `jax_parity`          -> jax_parity.json
  * brace lists:      `ref_parity_s{0,1,2}` -> ref_parity_s0.json ...
  * brace ranges:     `ref_DNNOneHotTransformer_s{0..4}`
  * globs:            `ref_DNNOneHotEmbedding_conti_s*`
  * path tokens (`tests/test_parity_reference.py`) denote in-suite gates
    with no data file; they are exempt from file matching.
Only the first (gate) column of each row is parsed — verdict-column
backticks cite code, not data files.
"""

from __future__ import annotations

import fnmatch
import re
from pathlib import Path

DOCS = Path(__file__).resolve().parents[1] / "docs"
DATA = DOCS / "parity_data"


def _expand_braces(tok: str) -> list[str]:
    m = re.search(r"\{([^}]*)\}", tok)
    if not m:
        return [tok]
    body = m.group(1)
    rng = re.fullmatch(r"(\d+)\.\.(\d+)", body)
    parts = ([str(i) for i in range(int(rng.group(1)), int(rng.group(2)) + 1)]
             if rng else body.split(","))
    out: list[str] = []
    for p in parts:
        out.extend(_expand_braces(tok[:m.start()] + p + tok[m.end():]))
    return out


def _index_rows() -> list[list[str]]:
    """Backticked tokens from the GATE column of each index-table row."""
    text = (DOCS / "PARITY.md").read_text()
    start = text.index("| Gate (data files) |")
    end = text.index("\n## ", start)
    rows = [ln for ln in text[start:end].splitlines()
            if ln.startswith("|")][2:]  # drop header + separator
    out = []
    for row in rows:
        gate_cell = row.split("|")[1]
        out.append(re.findall(r"`([^`]+)`", gate_cell))
    return out


def _file_patterns(row_tokens: list[str]) -> list[str]:
    pats = []
    for tok in row_tokens:
        if "/" in tok:  # in-suite gate (tests/...), no data file
            continue
        for pat in _expand_braces(tok):
            pats.append(pat if pat.endswith(".json") else pat + ".json")
    return pats


def test_index_table_parses():
    rows = _index_rows()
    assert len(rows) >= 20, f"index table truncated? parsed {len(rows)} rows"
    assert any("/" in t for row in rows for t in row), \
        "expected at least one in-suite (tests/...) gate row"


def test_every_parity_file_indexed_exactly_once():
    files = sorted(p.name for p in DATA.glob("*.json"))
    assert files, "docs/parity_data/ holds no .json files?"
    coverage = {f: [] for f in files}
    for i, row in enumerate(_index_rows()):
        pats = _file_patterns(row)
        for f in files:
            if any(fnmatch.fnmatch(f, p) for p in pats):
                coverage[f].append(i)
    unindexed = [f for f, rows in coverage.items() if not rows]
    duplicated = {f: rows for f, rows in coverage.items() if len(rows) > 1}
    assert not unindexed, (
        "parity data files with NO gate-index row in docs/PARITY.md "
        f"(undisclosed runs — the round-3 failure mode): {unindexed}")
    assert not duplicated, (
        f"parity data files matched by multiple index rows: {duplicated}")


def test_every_index_pattern_matches_a_file():
    files = sorted(p.name for p in DATA.glob("*.json"))
    dead = []
    for row in _index_rows():
        for pat in _file_patterns(row):
            if not any(fnmatch.fnmatch(f, pat) for f in files):
                dead.append(pat)
    assert not dead, (
        "PARITY.md index rows name parity files that do not exist "
        f"(stale rows or deleted evidence): {dead}")

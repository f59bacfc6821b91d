"""Citation hygiene: every ``file.py:N`` / ``file.py:N-M`` reference citation
in repo source and PARITY.md must resolve to a real file whose length covers
the cited line range.

Round-2 verdict found out-of-range citations (a 360-line ``sup_info.py``
cited at :469-482 / :704-717); this sweep makes the parity audit
mechanically checkable. A cited basename may exist in several trees
(reference AND repo); the citation passes if ANY candidate file covers the
range.
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

CITE_RE = re.compile(r"([A-Za-z0-9_./-]+\.(?:py|cpp|yaml)):(\d+)(?:-(\d+))?")


def _collect_sources():
    files = sorted((REPO / "perf_tpu").rglob("*.py"))
    files += [REPO / "PARITY.md", REPO / "core_exp_runner.py",
              REPO / "__graft_entry__.py", REPO / "bench.py"]
    return [f for f in files if f.exists()]


def _line_counts(root: Path) -> dict:
    counts: dict[str, list[tuple[str, int]]] = {}
    for ext in ("*.py", "*.cpp", "*.yaml"):
        for f in root.rglob(ext):
            if ".git" in f.parts:
                continue
            try:
                n = sum(1 for _ in f.open("rb"))
            except OSError:  # pragma: no cover
                continue
            counts.setdefault(f.name, []).append((str(f), n))
    return counts


@pytest.fixture(scope="module")
def candidates():
    counts = _line_counts(REPO)
    if REFERENCE.exists():
        ref = _line_counts(REFERENCE)
        for name, lst in ref.items():
            counts.setdefault(name, []).extend(lst)
    return counts


def test_all_citations_resolve(candidates):
    failures = []
    for src in _collect_sources():
        text = src.read_text(errors="replace")
        for m in CITE_RE.finditer(text):
            path, lo, hi = m.group(1), int(m.group(2)), m.group(3)
            hi = int(hi) if hi else lo
            name = os.path.basename(path)
            cands = candidates.get(name, [])
            # prefer candidates whose tail path matches the cited path
            matching = [c for c in cands if c[0].endswith(path)] or cands
            if not matching:
                failures.append(f"{src.relative_to(REPO)}: cites {m.group(0)}"
                                " — no such file in repo or reference")
            elif not any(n >= hi for _, n in matching):
                best = max(n for _, n in matching)
                failures.append(
                    f"{src.relative_to(REPO)}: cites {m.group(0)} but the "
                    f"longest candidate {name} has only {best} lines")
    assert not failures, "\n".join(failures)

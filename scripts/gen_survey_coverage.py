"""Regenerate SURVEY.md §8's EXTRA-operator index from ``queries()``
metadata (VERDICT r2 item #10: the hand-written ~180-row prose table
drifts; generate it from the code so the coverage claim can't diverge).

For every ``queries()`` entry the table records the oracle status
(SQL-oracled / rows-only) and the first sentence of the query
function's docstring (which by repo convention names the implementing
module and the scale shape). The §2-mapping rows above the markers
stay hand-maintained — they map to the reference inventory, which is
not derivable from code.

Usage: python scripts/gen_survey_coverage.py   (rewrites SURVEY.md
between the BEGIN/END GENERATED QUERY INDEX markers)
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN GENERATED QUERY INDEX (scripts/gen_survey_coverage.py) -->"
END = "<!-- END GENERATED QUERY INDEX -->"


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    # first sentence, but don't split inside e.g. "Lee-et-al." refs —
    # a period followed by a space and an uppercase letter is good
    # enough for these docstrings
    m = re.search(r"\.(?=\s+[A-Z(`]|$)", text)
    out = text[: m.end()] if m else text
    return out.replace("|", "\\|")


def build_table() -> str:
    sys.path.insert(0, REPO)
    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    lines = [
        f"{len(qs)} queries, {sum(1 for q in qs if q in oracles)} with a "
        "DuckDB `oracle_sql()` entry (driver-checked at sf0.01; the rest "
        "are rows-only by design). Generated from `queries()` docstrings "
        "— regenerate with `python scripts/gen_survey_coverage.py`.",
        "",
        "| Query | Oracle | What it is |",
        "|---|---|---|",
    ]
    for name in sorted(qs):
        mark = "SQL" if name in oracles else "rows-only"
        lines.append(f"| `{name}` | {mark} | {first_sentence(qs[name].__doc__)} |")
    return "\n".join(lines)


def main() -> None:
    path = os.path.join(REPO, "SURVEY.md")
    src = open(path).read()
    table = build_table()
    block = f"{BEGIN}\n\n{table}\n\n{END}"
    if BEGIN in src:
        src = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END), block, src, flags=re.S
        )
    else:
        raise SystemExit("SURVEY.md markers not found; add them first")
    open(path, "w").write(src)
    print("SURVEY.md §8 query index regenerated:",
          table.count("\n") - 3, "rows")


if __name__ == "__main__":
    main()

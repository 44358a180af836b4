"""Regenerate SURVEY.md §8.1's registry list from the live registry
(VERDICT r14 item 6): the doc drifted once (r14 added keys the prose
count had to chase), so the bullet list is now written mechanically
from ``__spark_entry__.queries()`` and pinned by
tests/test_entry_contract.py::test_survey_registry_list_matches_queries.

Usage:  python tools/gen_survey_registry.py          # rewrite in place
        python tools/gen_survey_registry.py --check  # exit 1 on drift
"""

from __future__ import annotations

import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SURVEY = os.path.join(HERE, "SURVEY.md")
# the generated block: every consecutive "- `name`" bullet line between
# the §8.1 header's prose and the next section
BLOCK_RE = re.compile(r"(?:^- `[a-z0-9_]+`\n)+", re.MULTILINE)
COUNT_RE = re.compile(r"^All \d+ `queries\(\)` keys", re.MULTILINE)


def registry_block() -> tuple[int, str]:
    import __spark_entry__ as entry

    names = sorted(entry.queries())
    return len(names), "".join(f"- `{n}`\n" for n in names)


def main() -> int:
    check = "--check" in sys.argv[1:]
    n, block = registry_block()
    with open(SURVEY, encoding="utf-8") as fh:
        text = fh.read()
    # operate only inside §8.1 (from its header to the next "### ")
    start = text.index("### 8.1 ")
    end = text.index("### 8.2", start) if "### 8.2" in text[start:] else len(text)
    section = text[start:end]
    m = BLOCK_RE.search(section)
    if not m:
        print("gen_survey_registry: no bullet block found in §8.1", file=sys.stderr)
        return 2
    new_section = (
        section[: m.start()] + block + section[m.end():]
    )
    new_section = COUNT_RE.sub(f"All {n} `queries()` keys", new_section, count=1)
    new_text = text[:start] + new_section + text[end:]
    if check:
        if new_text != text:
            print(
                "SURVEY §8.1 is stale — run python tools/gen_survey_registry.py",
                file=sys.stderr,
            )
            return 1
        print(f"SURVEY §8.1 in sync ({n} keys)")
        return 0
    if new_text != text:
        with open(SURVEY, "w", encoding="utf-8") as fh:
            fh.write(new_text)
        print(f"SURVEY §8.1 rewritten ({n} keys)")
    else:
        print(f"SURVEY §8.1 already in sync ({n} keys)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

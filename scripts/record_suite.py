"""Run the full test suite and record the result in SURVEY.md §14.

The standing per-round rule — "full pytest AFTER the last engine commit,
recorded in SURVEY" — was violated twice by hand (r8 verdict "What's
wrong #2"), so this script makes it self-enforcing:

1. refuses to run on a dirty tree (the record must certify a COMMIT,
   not a working directory);
2. runs ``python -m pytest tests/ -q`` and parses the summary line;
3. appends an entry to the append-only ``## 14. Full-suite record``
   section of SURVEY.md, naming the exact commit hash it certifies;
4. commits SURVEY.md (unless --no-commit), so the record and the rule
   travel together — a round whose last commit is not a record_suite
   commit visibly skipped the rule.

Exit status is nonzero on a red suite or a dirty tree, so any wrapper
script chains ``&&`` and cannot snapshot an unrecorded round.

Usage: python scripts/record_suite.py [--round N] [--no-commit]
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SURVEY = REPO / "SURVEY.md"
SECTION = "## 14. Full-suite record (append-only; written by scripts/record_suite.py)"


def sh(*args: str) -> str:
    return subprocess.run(
        args, cwd=REPO, check=True, capture_output=True, text=True
    ).stdout.strip()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None, help="round label for the entry")
    ap.add_argument("--no-commit", action="store_true")
    args = ap.parse_args()

    dirty = sh("git", "status", "--porcelain")
    if dirty:
        print("refusing: working tree is dirty — commit first, then record:\n" + dirty)
        return 2
    head = sh("git", "rev-parse", "--short", "HEAD")

    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-3:])
    print(tail)
    m = re.search(r"(\d+) passed", proc.stdout)
    passed = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) failed", proc.stdout)
    failed = int(m.group(1)) if m else 0
    m = re.search(r"in ([\d.]+)s", proc.stdout)
    secs = float(m.group(1)) if m else 0.0

    label = f"round {args.round}" if args.round else "unlabeled"
    entry = (
        f"- {label} @ {head}: **{passed} passed, {failed} failed** "
        f"({secs:.0f} s, `python -m pytest tests/ -q` on the clean tree at {head})"
    )
    text = SURVEY.read_text()
    if SECTION not in text:
        text = text.rstrip() + f"\n\n{SECTION}\n\nOne line per round, appended after the round's last engine commit; the script refuses dirty trees, so each hash is a real committed tree.\n\n{entry}\n"
    else:
        text = text.rstrip() + f"\n{entry}\n"
    SURVEY.write_text(text)
    print(entry)

    if failed or proc.returncode != 0:
        print("suite RED — recorded, not committing")
        return 1
    if not args.no_commit:
        sh("git", "add", "SURVEY.md")
        sh(
            "git",
            "commit",
            "-m",
            f"Record full-suite result for {head}: {passed} passed, {failed} failed",
        )
        print("committed suite record")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

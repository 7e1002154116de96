"""Regenerate the hand-drift-prone test count in README.md from an actual
pytest collection (VERDICT r2/r3/r4 each caught the typed number stale).

Usage:  python scripts/update_test_count.py [--check]

--check exits non-zero if the README disagrees with collection instead of
rewriting it (used by tests/test_observability.py so the count can never
drift past a green gate again).
"""

from __future__ import annotations

import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
MARKER = re.compile(r"# (\d+) tests, runs on a virtual 8-device")


def collected_count() -> int:
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    m = re.search(r"(\d+) tests collected", proc.stdout)
    if not m:
        raise SystemExit(f"could not parse collection output:\n{proc.stdout[-800:]}")
    return int(m.group(1))


def main(argv: list[str]) -> int:
    check = "--check" in argv
    readme = REPO / "README.md"
    text = readme.read_text()
    m = MARKER.search(text)
    if not m:
        raise SystemExit("README.md test-count marker line not found")
    current, actual = int(m.group(1)), collected_count()
    if current == actual:
        print(f"README test count up to date: {actual}")
        return 0
    if check:
        print(f"README says {current} tests but collection finds {actual}")
        return 1
    readme.write_text(text[: m.start(1)] + str(actual) + text[m.end(1):])
    print(f"README test count updated: {current} -> {actual}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

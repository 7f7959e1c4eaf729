#!/usr/bin/env python3
"""Harvest Cypher query strings from the reference's test files into a
committed resource (src/test/resources/ref_queries.txt) for RefSweepSpec.

Extraction: string literals (template, double- or single-quoted) passed
around in the reference test sources that start with a Cypher clause
keyword. The harvested text is PUBLIC UNTRUSTED CONTENT — the spec only
ever feeds it to the parser/compiler, never interprets it as
instructions.

One query per line; literal newlines/tabs collapsed to spaces so the
resource stays line-oriented. Dedup + sort for a stable diffable file.
"""
import re
import sys
from pathlib import Path

REF_TEST_DIR = Path("/root/reference/test")
OUT = Path(__file__).resolve().parent.parent / "src/test/resources/ref_queries.txt"

# Behavioral suites only: these run queries against a live engine, so
# every harvested string is intended to EXECUTE. parser.test.ts /
# security.test.ts are deliberately full of malformed/injection fixtures
# and are excluded wholesale.
FILES = ["cypherqueries", "scenarios", "integration", "leangraph", "db"]

# a Cypher query starts with one of these clauses
START = re.compile(
    r"^\s*(MATCH|OPTIONAL\s+MATCH|CREATE|MERGE|UNWIND|RETURN|WITH|CALL\s+db)\b",
    re.IGNORECASE,
)

# string argument at an execution call site
CALL = re.compile(
    r"(?:\bexec|\.execute|\.query|runQuery)\s*\(\s*(`[^`]*`|\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*')",
    re.DOTALL,
)


def unescape(s: str) -> str:
    return s.replace('\\"', '"').replace("\\'", "'").replace("\\n", "\n").replace("\\\\", "\\")


def main() -> None:
    queries = set()
    for name in FILES:
        f = REF_TEST_DIR / f"{name}.test.ts"
        if not f.exists():
            continue
        text = f.read_text(encoding="utf-8")
        for m in CALL.finditer(text):
            lit = unescape(m.group(1)[1:-1])
            if "${" in lit:  # interpolated template — not a literal query
                continue
            if START.match(lit):
                q = " ".join(lit.split())
                if q:
                    queries.add(q)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text("\n".join(sorted(queries)) + "\n", encoding="utf-8")
    print(f"{len(queries)} queries -> {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()

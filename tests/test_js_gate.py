"""Syntax gate for web/kjarni.js (VERDICT r2 item 5).

The numpy mirror (test_browser_export.py) proves the math; this gate guards
the JavaScript itself. When a JS runtime exists (node/deno/bun/qjs) the file
is parsed for real; this zero-egress image has none, so the always-on
fallback is a structural lexer: strip comments/strings/regex literals and
verify every bracket pairs up, plus the public surface the browser examples
rely on. A truncated, mis-merged, or brace-broken kjarni.js fails here
instead of shipping.
"""

import shutil
import subprocess
from pathlib import Path

import pytest

JS = Path(__file__).resolve().parent.parent / "web" / "kjarni.js"

_RUNTIMES = [
    ("node", ["node", "--check"]),
    ("deno", ["deno", "check", "--quiet"]),
    ("bun", ["bun", "build", "--no-bundle"]),
    ("qjs", ["qjs", "--std", "-e", "1"]),   # availability probe only
]


def _find_runtime():
    for name, cmd in _RUNTIMES:
        if shutil.which(name):
            return name, cmd
    return None, None


def strip_noncode(src: str) -> str:
    """Remove comments, string/template/regex literals; keep brackets."""
    out = []
    i, n = 0, len(src)
    # characters after which a `/` starts a regex literal, not division
    regex_prefix = set("=(,:;!&|?{}[\n+-*%~^<>")
    last_sig = "\n"
    while i < n:
        c = src[i]
        nxt = src[i + 1] if i + 1 < n else ""
        if c == "/" and nxt == "/":
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "/" and nxt == "*":
            j = src.find("*/", i + 2)
            assert j >= 0, "unterminated block comment"
            i = j + 2
            continue
        if c in "'\"":
            j = i + 1
            while j < n and src[j] != c:
                j += 2 if src[j] == "\\" else 1
            assert j < n, f"unterminated string at {i}"
            i = j + 1
            last_sig = c
            continue
        if c == "`":
            j = i + 1
            while j < n and src[j] != "`":
                j += 2 if src[j] == "\\" else 1
            assert j < n, "unterminated template literal"
            i = j + 1
            last_sig = c
            continue
        if c == "/" and last_sig in regex_prefix:
            j = i + 1
            in_class = False
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == "[":
                    in_class = True
                elif src[j] == "]":
                    in_class = False
                elif src[j] == "/" and not in_class:
                    break
                j += 1
            assert j < n, f"unterminated regex at {i}"
            i = j + 1
            last_sig = "/"
            continue
        out.append(c)
        if not c.isspace():
            last_sig = c
        i += 1
    return "".join(out)


class TestJsGate:
    def test_real_runtime_parse(self):
        name, cmd = _find_runtime()
        if name is None:
            pytest.skip("no JS runtime in image (node/deno/bun/qjs)")
        r = subprocess.run(cmd + [str(JS)], capture_output=True, text=True,
                           timeout=60)
        assert r.returncode == 0, r.stderr

    def test_brackets_balance(self):
        code = strip_noncode(JS.read_text())
        pairs = {")": "(", "]": "[", "}": "{"}
        stack = []
        line = 1
        for ch in code:
            if ch == "\n":
                line += 1
            elif ch in "([{":
                stack.append((ch, line))
            elif ch in ")]}":
                assert stack, f"unmatched '{ch}' at line {line}"
                top, tline = stack.pop()
                assert top == pairs[ch], \
                    f"'{top}' (line {tline}) closed by '{ch}' (line {line})"
        assert not stack, f"unclosed '{stack[-1][0]}' at line {stack[-1][1]}"

    def test_no_merge_markers_or_truncation(self):
        src = JS.read_text()
        assert "<<<<<<<" not in src and ">>>>>>>" not in src
        assert src.rstrip().endswith("}")

    def test_public_surface_present(self):
        src = JS.read_text()
        for name in ("class KjarniModel", "class KjarniIndex",
                     "class KjarniTokenizer", "class KjarniGPT",
                     "class KjarniBpeTokenizer", "module.exports"):
            assert name in src, f"missing {name}"

    def test_lexer_catches_breakage(self):
        """The gate itself must fail on representative damage."""
        src = JS.read_text()
        broken = src.replace("class KjarniIndex {", "class KjarniIndex {{", 1)
        with pytest.raises(AssertionError):
            TestJsGate._balance(broken)
        # cut just after an opening brace past the midpoint: the prefix is
        # then guaranteed inside an unclosed block (a plain midpoint cut can
        # land on a balanced boundary as the file grows)
        cut = src.index("{", len(src) // 2) + 1
        truncated = src[:cut]
        with pytest.raises(AssertionError):
            TestJsGate._balance(truncated)

    @staticmethod
    def _balance(src):
        code = strip_noncode(src)
        stack = []
        pairs = {")": "(", "]": "[", "}": "{"}
        for ch in code:
            if ch in "([{":
                stack.append(ch)
            elif ch in ")]}":
                assert stack and stack.pop() == pairs[ch], "unbalanced"
        assert not stack, "unclosed bracket"

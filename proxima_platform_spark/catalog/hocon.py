"""Minimal HOCON parser — enough for reference-style repository configs.

The reference loads its repository from HOCON via Typesafe Config
(core/.../repository/ConfigRepository.java:372-401; the canonical example is
core/src/test/resources/test-readme.conf). No pyhocon in this container, so
this module implements the subset those configs actually use:

* ``key { ... }`` object syntax (no separator), ``key: value``, ``key = value``
* root braces optional; dotted keys (``a.b.c = 1``) expand to nested objects
* ``#`` and ``//`` comments; commas optional at end-of-line
* arrays ``[a, b]`` of any value form
* quoted/unquoted strings; ints/floats/booleans/null typed
* value concatenation: ``"kafka://"${brokers}/${topic}"?x=1"`` builds one
  string from quoted pieces, unquoted pieces, and substitutions
* ``${path}`` / ``${?path}`` substitutions resolved against the root
  (self-referential chains resolve iteratively; ``${?}`` missing → dropped)
* duplicate object keys deep-merge (later wins for scalars), per the spec

NOT supported (raise, rather than mis-parse): ``include``, multi-line
strings, ``+=`` appends. These do not appear in the reference's configs.
"""

from __future__ import annotations

import re
from typing import Any


class HoconError(ValueError):
    pass


class _Subst:
    """Unresolved ``${path}`` marker (``optional`` for ``${?path}``)."""

    __slots__ = ("path", "optional")

    def __init__(self, path: str, optional: bool):
        self.path = path
        self.optional = optional

    def __repr__(self):  # pragma: no cover — debug aid
        return f"${{{'?' if self.optional else ''}{self.path}}}"


class _Concat:
    """Adjacent value pieces to be string-joined after substitution."""

    __slots__ = ("parts",)

    def __init__(self, parts: list):
        self.parts = parts


_UNQUOTED_END = set('{}[],:=#\n"$')
_NUM_RE = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


class _Parser:
    def __init__(self, text: str):
        self.s = text
        self.n = len(text)
        self.i = 0

    # -- low-level ---------------------------------------------------------

    def _skip_ws(self, newlines: bool = True) -> None:
        while self.i < self.n:
            c = self.s[self.i]
            if c == "#" or self.s.startswith("//", self.i):
                while self.i < self.n and self.s[self.i] != "\n":
                    self.i += 1
            elif c.isspace() and (newlines or c != "\n"):
                self.i += 1
            else:
                return

    def _peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def _error(self, msg: str) -> HoconError:
        line = self.s.count("\n", 0, self.i) + 1
        return HoconError(f"line {line}: {msg}")

    # -- values ------------------------------------------------------------

    def parse_root(self) -> dict:
        self._skip_ws()
        if self._peek() == "{":
            obj = self._parse_object()
        else:
            obj = self._parse_object_body(root=True)
        self._skip_ws()
        if self.i < self.n:
            raise self._error(f"trailing content {self.s[self.i:self.i+20]!r}")
        return obj

    def _parse_object(self) -> dict:
        assert self._peek() == "{"
        self.i += 1
        obj = self._parse_object_body(root=False)
        if self._peek() != "}":
            raise self._error("expected '}'")
        self.i += 1
        return obj

    def _parse_object_body(self, root: bool) -> dict:
        obj: dict = {}
        while True:
            self._skip_ws()
            if self.i >= self.n:
                if not root:
                    raise self._error("unexpected end of input in object")
                return obj
            if self._peek() == "}":
                return obj
            if self._peek() == ",":
                self.i += 1
                continue
            key = self._parse_key()
            if key == "include":
                raise self._error("'include' is not supported")
            self._skip_ws(newlines=False)
            c = self._peek()
            if c == "{":
                value: Any = self._parse_object()
            elif c == "+" and self.s.startswith("+=", self.i):
                raise self._error("'+=' is not supported")
            elif c in (":", "="):
                self.i += 1
                self._skip_ws(newlines=False)
                value = self._parse_value()
            else:
                raise self._error(f"expected ':', '=' or '{{' after key {key!r}")
            # quoted keys are literal; only unquoted keys are path expressions
            path = [str(key)] if _is_quoted_marker(key) else key.split(".")
            self._merge_key(obj, path, value)

    def _parse_key(self) -> str:
        if self._peek() == '"':
            return self._parse_quoted()
        start = self.i
        while self.i < self.n and (
            self.s[self.i] not in _UNQUOTED_END and not self.s[self.i].isspace()
        ):
            self.i += 1
        if self.i == start:
            raise self._error(f"expected a key, found {self._peek()!r}")
        return self.s[start : self.i]

    def _parse_value(self) -> Any:
        """One value: possibly a concatenation of adjacent pieces up to the
        end of line / ',' / '}' / ']' / comment. Whitespace BETWEEN pieces is
        preserved in string concatenations, per the HOCON spec
        ('hello ${name}' → 'hello Bob', not 'helloBob')."""
        parts: list = []
        gaps: list = []  # whitespace run preceding each part
        raw_strings = False
        pending_gap = ""
        while self.i < self.n:
            c = self._peek()
            if c in "\n,}]" or c == "#" or self.s.startswith("//", self.i):
                break
            before = self.i
            if c == "{":
                part: Any = self._parse_object()
            elif c == "[":
                part = self._parse_array()
            elif c == '"':
                part = self._parse_quoted()
                raw_strings = True
            elif c == "$":
                part = self._parse_subst()
            else:
                piece = self._parse_unquoted_piece()
                if piece is None:
                    # no progress possible: the next char ends an unquoted
                    # string (':', '=', …) but is not a valid value start —
                    # raise instead of spinning forever
                    raise self._error(
                        f"unexpected {self._peek()!r} in value (quote the "
                        "string if it should contain this character)"
                    )
                part = piece
                raw_strings = True
            assert self.i > before  # every branch must consume input
            parts.append(part)
            gaps.append(pending_gap)
            # capture (non-newline) whitespace before a possible next piece
            ws_start = self.i
            self._skip_ws(newlines=False)
            pending_gap = self.s[ws_start : self.i]
        if not parts:
            raise self._error("expected a value")
        # unquoted pieces keep their internal/trailing whitespace for exact
        # concatenation; the VALUE's trailing whitespace is trimmed (spec)
        if parts and isinstance(parts[-1], str) and not _is_quoted_marker(parts[-1]):
            parts[-1] = parts[-1].rstrip()
            if not parts[-1]:
                parts.pop()
                gaps.pop()
        if not parts:
            raise self._error("expected a value")
        if len(parts) == 1:
            p = parts[0]
            return _typed(p) if raw_strings and isinstance(p, str) and not _is_quoted_marker(p) else p
        merged: list = []
        for gap, part in zip(gaps, parts):
            if merged and gap:
                merged.append(gap)
            merged.append(part)
        return _Concat(merged)

    def _parse_unquoted_piece(self) -> str | None:
        start = self.i
        while self.i < self.n:
            c = self.s[self.i]
            if c in _UNQUOTED_END or c == "[" or c == "]":
                break
            if self.s.startswith("//", self.i):
                break
            self.i += 1
        piece = self.s[start : self.i]
        return piece if piece else None

    def _parse_quoted(self) -> str:
        if self.s.startswith('"""', self.i):
            raise self._error("multi-line strings are not supported")
        assert self._peek() == '"'
        self.i += 1
        out = []
        while self.i < self.n:
            c = self.s[self.i]
            if c == '"':
                self.i += 1
                return _QuotedStr("".join(out))
            if c == "\\":
                self.i += 1
                esc = self.s[self.i]
                out.append(
                    {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "/": "/"}.get(
                        esc, esc
                    )
                )
                self.i += 1
            else:
                out.append(c)
                self.i += 1
        raise self._error("unterminated string")

    def _parse_subst(self) -> _Subst:
        if not self.s.startswith("${", self.i):
            raise self._error("lone '$'")
        self.i += 2
        optional = self._peek() == "?"
        if optional:
            self.i += 1
        end = self.s.find("}", self.i)
        if end < 0:
            raise self._error("unterminated substitution")
        path = self.s[self.i : end].strip()
        self.i = end + 1
        return _Subst(path, optional)

    def _parse_array(self) -> list:
        assert self._peek() == "["
        self.i += 1
        out = []
        while True:
            self._skip_ws()
            if self._peek() == "]":
                self.i += 1
                return out
            if self._peek() == ",":
                self.i += 1
                continue
            out.append(self._parse_value())
            self._skip_ws()
            if self._peek() == ",":
                self.i += 1

    # -- key merging -------------------------------------------------------

    def _merge_key(self, obj: dict, path: list[str], value: Any) -> None:
        key = path[0]
        if len(path) > 1:
            child = obj.setdefault(key, {})
            if not isinstance(child, dict):
                child = {}
                obj[key] = child
            self._merge_key(child, path[1:], value)
            return
        existing = obj.get(key)
        if isinstance(existing, dict) and isinstance(value, dict):
            _deep_merge(existing, value)
        else:
            obj[key] = value


class _QuotedStr(str):
    """Marks a string as having come from quotes (exempt from typing)."""


def _is_quoted_marker(v) -> bool:
    return isinstance(v, _QuotedStr)


def _typed(s: str) -> Any:
    if s == "true":
        return True
    if s == "false":
        return False
    if s == "null":
        return None
    if _NUM_RE.match(s):
        return float(s) if ("." in s or "e" in s or "E" in s) else int(s)
    return s


def _deep_merge(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(dst.get(k), dict) and isinstance(v, dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v


# ---------------------------------------------------------------------------
# substitution resolution
# ---------------------------------------------------------------------------


def _lookup(root: dict, path: str):
    node: Any = root
    for part in path.split("."):
        if not isinstance(node, dict) or part not in node:
            raise KeyError(path)
        node = node[part]
    return node


_UNRESOLVED = object()


def _resolve(node: Any, root: dict):
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            rv = _resolve(v, root)
            if rv is not _UNRESOLVED:
                out[str(k)] = rv  # str() drops the _QuotedStr key marker
        return out
    if isinstance(node, list):
        return [rv for rv in (_resolve(v, root) for v in node) if rv is not _UNRESOLVED]
    if isinstance(node, _Subst):
        try:
            return _resolve(_lookup(root, node.path), root)
        except KeyError:
            if node.optional:
                return _UNRESOLVED
            raise HoconError(f"unresolved substitution ${{{node.path}}}") from None
    if isinstance(node, _Concat):
        pieces = []
        for p in node.parts:
            rp = _resolve(p, root)
            if rp is _UNRESOLVED:
                continue
            pieces.append(rp if isinstance(rp, str) else str(rp))
        return "".join(pieces)
    if isinstance(node, _QuotedStr):
        return str(node)
    return node


def loads(text: str) -> dict:
    """Parse HOCON text into a plain dict (substitutions resolved)."""
    tree = _Parser(text).parse_root()
    return _resolve(tree, tree)


def load(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as fh:
        return loads(fh.read())

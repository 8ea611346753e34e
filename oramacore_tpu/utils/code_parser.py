"""Code-aware tokenization for TS/TSX/JS sources.

Reference: src/code_parser/ — tree-sitter TS/TSX parsing → `CodeToken`s
(imports, function declarations, JSX components, comments,
code_parser/mod.rs:18,44) and an oxc-based `tool_parser` extracting tool
parameters from JS `export default` (tool_parser.rs:1-5).

No tree-sitter in this image; a structured regex scanner extracts the
same token classes, plus identifier-splitting (camelCase / snake_case /
kebab-case) so code searches match sub-words.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

_IMPORT_RE = re.compile(
    r"""import\s+(?:type\s+)?(?:([\w$]+)\s*,?\s*)?(?:\{([^}]*)\})?\s*from\s*['"]([^'"]+)['"]""",
)
_REQUIRE_RE = re.compile(r"""(?:const|let|var)\s+([\w${},\s]+)\s*=\s*require\(\s*['"]([^'"]+)['"]\s*\)""")
_FN_DECL_RE = re.compile(
    r"""(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*([\w$]+)?\s*\(([^)]*)\)"""
)
_ARROW_RE = re.compile(
    r"""(?:export\s+)?(?:const|let|var)\s+([\w$]+)\s*(?::[^=]+)?=\s*(?:async\s*)?(?:\(([^)]*)\)|([\w$]+))\s*=>"""
)
_METHOD_RE = re.compile(r"""^\s*(?:public|private|protected|static|async|\s)*([\w$]+)\s*\(([^)]*)\)\s*[:{]""", re.M)
_CLASS_RE = re.compile(r"""(?:export\s+)?(?:abstract\s+)?class\s+([\w$]+)""")
_JSX_RE = re.compile(r"""<([A-Z][\w$]*)[\s/>]""")
_LINE_COMMENT_RE = re.compile(r"//([^\n]*)")
_BLOCK_COMMENT_RE = re.compile(r"/\*(.*?)\*/", re.S)
_STRING_RE = re.compile(r"""(['"`])((?:\\.|(?!\1).)*)\1""")
_IDENT_RE = re.compile(r"[A-Za-z_$][\w$]*")

_CAMEL_SPLIT_RE = re.compile(
    r"[A-Z]+(?=[A-Z][a-z])|[A-Z]?[a-z]+|[A-Z]+|\d+"
)


@dataclass
class CodeToken:
    kind: str   # import | function | class | jsx | comment | string | identifier
    value: str
    parts: List[str] = field(default_factory=list)  # split sub-words


def split_identifier(ident: str) -> List[str]:
    """fooBarBaz / foo_bar / foo-bar → [foo, bar, baz] (lowercased)."""
    out: List[str] = []
    for chunk in re.split(r"[_\-.]", ident):
        out.extend(m.group(0).lower() for m in _CAMEL_SPLIT_RE.finditer(chunk))
    return [p for p in out if p]


class CodeParser:
    """Extract typed tokens from TS/TSX/JS source."""

    def parse(self, source: str) -> List[CodeToken]:
        tokens: List[CodeToken] = []

        for m in _IMPORT_RE.finditer(source):
            default, named, module = m.groups()
            names = []
            if default:
                names.append(default)
            if named:
                names.extend(n.strip().split(" as ")[0] for n in named.split(",") if n.strip())
            for n in names:
                tokens.append(CodeToken("import", n, split_identifier(n)))
            tokens.append(CodeToken("import", module, split_identifier(module)))
        for m in _REQUIRE_RE.finditer(source):
            tokens.append(CodeToken("import", m.group(2), split_identifier(m.group(2))))

        for m in _FN_DECL_RE.finditer(source):
            name = m.group(1)
            if name:
                tokens.append(CodeToken("function", name, split_identifier(name)))
        for m in _ARROW_RE.finditer(source):
            tokens.append(CodeToken("function", m.group(1), split_identifier(m.group(1))))
        for m in _CLASS_RE.finditer(source):
            tokens.append(CodeToken("class", m.group(1), split_identifier(m.group(1))))
        for m in _JSX_RE.finditer(source):
            tokens.append(CodeToken("jsx", m.group(1), split_identifier(m.group(1))))
        for m in _LINE_COMMENT_RE.finditer(source):
            text = m.group(1).strip()
            if text:
                tokens.append(CodeToken("comment", text))
        for m in _BLOCK_COMMENT_RE.finditer(source):
            text = " ".join(m.group(1).split())
            if text:
                tokens.append(CodeToken("comment", text))
        return tokens

    def tokens_for_indexing(self, source: str) -> List[str]:
        """Flat token stream for the string index."""
        out: List[str] = []
        for tok in self.parse(source):
            if tok.kind == "comment":
                out.extend(w.lower() for w in re.findall(r"[\w$]+", tok.value))
            else:
                out.append(tok.value.lower())
                out.extend(tok.parts)
        return out


# ---------------------------------------------------------------------------
# Tool parameter extraction (reference tool_parser.rs)
# ---------------------------------------------------------------------------

_EXPORT_DEFAULT_FN_RE = re.compile(
    r"""export\s+default\s+(?:async\s+)?function\s*([\w$]*)\s*\(([^)]*)\)"""
)
_EXPORT_DEFAULT_ARROW_RE = re.compile(
    r"""export\s+default\s+(?:async\s*)?\(([^)]*)\)\s*=>"""
)


def extract_tool_params(code: str) -> Optional[Dict[str, Any]]:
    """Extract parameter names from a JS tool's `export default` function
    into a minimal JSON schema (reference oxc-based tool_parser)."""
    m = _EXPORT_DEFAULT_FN_RE.search(code) or _EXPORT_DEFAULT_ARROW_RE.search(code)
    if not m:
        return None
    params_src = m.group(m.lastindex)  # last group = params
    props: Dict[str, Any] = {}
    # destructured object param: ({a, b = 1, c})
    destructured = re.match(r"\s*\{([^}]*)\}", params_src)
    if destructured:
        for part in destructured.group(1).split(","):
            name = part.split("=")[0].split(":")[0].strip()
            if name:
                props[name] = {"type": "string"}
    else:
        for part in params_src.split(","):
            name = part.split("=")[0].split(":")[0].strip()
            if name:
                props[name] = {"type": "string"}
    return {"type": "object", "properties": props}

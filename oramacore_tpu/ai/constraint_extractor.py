"""Deterministic (non-LLM) numeric/price constraint extraction.

Reference: src/ai/constraint_extractor.rs — `extract_constraints` (:82),
`match_numeric_constraints` (:500), `inject_constraints` (:732),
`has_shared_budget` (:814). The LLM composes SearchParams; this module
validates and force-injects numeric constraints the LLM may have
dropped, and detects shared-budget phrasing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

_NUM = r"(\d+(?:[.,]\d+)?)"
_CURRENCY = r"(?:\$|€|£|usd|eur|gbp|dollars?|euros?|pounds?|bucks?)"

# pattern → operator factory
_PATTERNS = [
    # between X and Y
    (re.compile(rf"between\s+{_CURRENCY}?\s*{_NUM}\s+and\s+{_CURRENCY}?\s*{_NUM}", re.I),
     lambda m: ("between", [_f(m.group(1)), _f(m.group(2))])),
    (re.compile(rf"from\s+{_CURRENCY}?\s*{_NUM}\s+to\s+{_CURRENCY}?\s*{_NUM}", re.I),
     lambda m: ("between", [_f(m.group(1)), _f(m.group(2))])),
    # under / below / less than / cheaper than / at most / max / up to
    (re.compile(rf"(?:under|below|less\s+than|cheaper\s+than|at\s+most|max(?:imum)?(?:\s+of)?|up\s+to|no\s+more\s+than|within)\s+{_CURRENCY}?\s*{_NUM}", re.I),
     lambda m: ("lte", _f(m.group(1)))),
    # over / above / more than / at least / min
    (re.compile(rf"(?:over|above|more\s+than|at\s+least|min(?:imum)?(?:\s+of)?|starting\s+(?:at|from))\s+{_CURRENCY}?\s*{_NUM}", re.I),
     lambda m: ("gte", _f(m.group(1)))),
    # exactly X / for X dollars
    (re.compile(rf"(?:exactly|precisely)\s+{_CURRENCY}?\s*{_NUM}", re.I),
     lambda m: ("eq", _f(m.group(1)))),
    # "$100" alone following price-ish words
    (re.compile(rf"(?:price[ds]?\s+(?:at|of)?|costs?\s+)\s*{_CURRENCY}?\s*{_NUM}", re.I),
     lambda m: ("eq", _f(m.group(1)))),
]

_BUDGET_RE = re.compile(
    rf"(?:total\s+budget|budget\s+of|altogether|in\s+total|combined|all\s+together|overall\s+budget)"
    rf"(?:\s+(?:of|is|:)?)?\s*{_CURRENCY}?\s*{_NUM}",
    re.I,
)
_HAVE_BUDGET_RE = re.compile(
    rf"i\s+have\s+{_CURRENCY}?\s*{_NUM}\s*(?:{_CURRENCY})?\s+(?:for|to\s+spend)",
    re.I,
)


def _f(s: str) -> float:
    return float(s.replace(",", "."))


@dataclass
class NumericConstraint:
    op: str                      # eq | lte | gte | between
    value: Any                   # float or [lo, hi]
    span: str                    # matched text (for debugging)


def extract_constraints(query: str) -> List[NumericConstraint]:
    """All numeric constraints present in the query text."""
    out: List[NumericConstraint] = []
    taken: List[range] = []
    for pattern, make in _PATTERNS:
        for m in pattern.finditer(query):
            r = range(m.start(), m.end())
            if any(r.start < t.stop and t.start < r.stop for t in taken):
                continue
            op, value = make(m)
            out.append(NumericConstraint(op, value, m.group(0)))
            taken.append(r)
    return out


def has_shared_budget(query: str) -> Optional[float]:
    """Detect 'total budget of X' style phrasing across multiple items
    (reference :814). Returns the budget amount or None."""
    m = _BUDGET_RE.search(query) or _HAVE_BUDGET_RE.search(query)
    if not m:
        return None
    multi = bool(re.search(r"\band\b|,", query))
    return _f(m.group(1)) if multi else None


def _where_has_numeric(where: Dict[str, Any]) -> bool:
    for key, value in (where or {}).items():
        if key in ("and", "or"):
            if any(_where_has_numeric(v) for v in value):
                return True
        elif key == "not":
            if _where_has_numeric(value):
                return True
        elif isinstance(value, dict) and any(
            op in value for op in ("eq", "gt", "gte", "lt", "lte", "between")
        ):
            return True
        elif isinstance(value, (int, float)) and not isinstance(value, bool):
            return True
    return False


def inject_constraints(
    search_params: Dict[str, Any],
    constraints: List[NumericConstraint],
    numeric_properties: List[str],
) -> Dict[str, Any]:
    """Ensure LLM-composed search params carry the query's numeric
    constraints (reference :732): if `where` lacks any numeric condition
    and the query had one, inject it on the best-guess numeric property
    (prefer one named like price/cost, else the first)."""
    if not constraints or not numeric_properties:
        return search_params
    where = dict(search_params.get("where") or {})
    if _where_has_numeric(where):
        return search_params
    prop = next(
        (p for p in numeric_properties
         if any(k in p.lower() for k in ("price", "cost", "amount", "budget"))),
        numeric_properties[0],
    )
    c = constraints[0]
    where[prop] = {c.op: c.value}
    out = dict(search_params)
    out["where"] = where
    return out


def validate_constraints(
    search_params: Dict[str, Any], constraints: List[NumericConstraint]
) -> bool:
    """True when params reflect the extracted constraints (or none exist)."""
    if not constraints:
        return True
    return _where_has_numeric(search_params.get("where") or {})

"""Query DSLs (D1-D3) → SearchQuery.

  * QueryParser — the natural-language DSL
    (reference: src/DSL/QueryParser.php:21-552): free-text head, field
    conditions (`status = "published" AND price <= 100`), FIELDS / SORT
    (`-field` = desc) / PAGE n,size / LIMIT / OFFSET keywords, `[a, b]`
    array values, `=?` eq-or-empty, negation.
  * URLQueryParser — JSON-API style params
    (reference: src/DSL/URLQueryParser.php:19-305):
    `filter[f][op]=v`, `sort=-f,g`, `page[limit/offset/number/size]`,
    fuzzy/highlight flags, facets, boost.
  * QueryBuilder — fluent builder with metadata-field auto-prefixing
    (reference: src/DSL/QueryBuilder.php:38-235).
"""

from __future__ import annotations

import re
from typing import Any

from .engine import SearchQuery

_URL_OP_MAP = {
    "eq": "=", "eqor": "=?", "neq": "!=", "ne": "!=", "gt": ">", "gte": ">=",
    "lt": "<", "lte": "<=", "like": "like", "in": "in", "nin": "not in",
    "between": "between", "exists": "exists", "null": "is null",
    "notnull": "is not null",
}

_DSL_TOKEN_RE = re.compile(
    r"""
    (?P<string>"[^"]*"|'[^']*')            |
    (?P<operator>=\?|!=|>=|<=|>|<|=|\bLIKE\b|\bNOT\s+IN\b|\bIN\b|\bAND\b|\bOR\b) |
    (?P<keyword>\bFIELDS\b|\bSORT\b|\bPAGE\b|\bLIMIT\b|\bOFFSET\b|\bFUZZY\b|\bHIGHLIGHT\b|\bNEAR\b|\bWITHIN\b) |
    (?P<number>-?\d+\.?\d*)                |
    (?P<field>\w+(?:\.\w+)*\*?)            |
    (?P<bracket>\[|\])                     |
    (?P<paren>\(|\))                       |
    (?P<comma>,)                           |
    (?P<colon>:)                           |
    (?P<dash>-)                            |
    (?P<ws>\s+)
    """,
    re.VERBOSE | re.IGNORECASE,
)


class QueryParser:
    """`bash error FIELDS text SORT -ts LIMIT 5 role = "assistant"` etc."""

    def __init__(self) -> None:
        self.tokens: list[tuple[str, str]] = []
        self.pos = 0

    def parse(self, text: str) -> SearchQuery:
        self.tokens = []
        self.pos = 0
        for m in _DSL_TOKEN_RE.finditer(text):
            kind = m.lastgroup
            if kind != "ws":
                self.tokens.append((kind, m.group()))
        q = SearchQuery()
        query_parts: list[str] = []
        in_query = True
        while self.pos < len(self.tokens):
            kind, val = self._cur()
            if kind == "keyword":
                kw = val.upper()
                if kw in ("NEAR", "WITHIN"):
                    # geo grammar: NEAR(lat, lng, radius) / WITHIN(n, s, e, w)
                    # (reference keyword slots, src/DSL/QueryParser.php:61,
                    # 138-142 — the reference stubs the args; we parse them).
                    # Non-numeric args (FTS5 NEAR(a b, 5)) stay query text.
                    nums = self._try_parse_geo_args()
                    if nums is None:
                        if in_query:
                            query_parts.append(val)
                        self._next()
                        continue
                    if kw == "NEAR" and len(nums) >= 3:
                        q.geo_filters["near"] = {"lat": nums[0],
                                                 "lng": nums[1],
                                                 "radius": nums[2]}
                    elif kw == "WITHIN" and len(nums) >= 4:
                        q.geo_filters["within"] = {
                            "north": nums[0], "south": nums[1],
                            "east": nums[2], "west": nums[3]}
                    continue
                in_query = False
                self._next()
                if kw == "FIELDS":
                    q.boost_fields = {f: 1.0 for f in self._parse_fields()}
                elif kw == "SORT":
                    q.sort = self._parse_sort()
                elif kw in ("PAGE", "LIMIT", "OFFSET"):
                    self._parse_pagination(kw, q)
                elif kw == "FUZZY":
                    q.fuzzy = True
                elif kw == "HIGHLIGHT":
                    q.highlight = True
            elif in_query and self._is_condition():
                in_query = False
                q.filters.extend(self._parse_conditions())
            elif in_query:
                query_parts.append(val.strip("\"'") if kind == "string" else val)
                self._next()
            else:
                if self._is_condition():
                    q.filters.extend(self._parse_conditions())
                else:
                    self._next()
        q.query = " ".join(query_parts).strip()
        return q

    # -- internals -----------------------------------------------------------

    def _cur(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else (None, None)

    def _peek(self):
        return self.tokens[self.pos + 1] if self.pos + 1 < len(self.tokens) else (None, None)

    def _next(self):
        self.pos += 1

    def _try_parse_geo_args(self) -> list[float] | None:
        """At a NEAR/WITHIN keyword: consume `(n, n, …)` of pure numbers and
        return them; leave position untouched and return None otherwise."""
        start = self.pos
        self._next()
        if self._cur() != ("paren", "("):
            self.pos = start
            return None
        self._next()
        nums: list[float] = []
        while self.pos < len(self.tokens):
            kind, val = self._cur()
            if kind == "paren" and val == ")":
                self._next()
                return nums if nums else None
            if kind == "comma":
                self._next()
                continue
            if kind == "number":
                nums.append(float(val))
                self._next()
                continue
            if kind == "dash":  # negative coordinate
                self._next()
                k2, v2 = self._cur()
                if k2 == "number":
                    nums.append(-float(v2))
                    self._next()
                    continue
            self.pos = start  # non-numeric content → FTS NEAR, not geo
            return None
        self.pos = start
        return None

    def _is_condition(self) -> bool:
        k, _ = self._cur()
        nk, nv = self._peek()
        return (k == "field" and nk == "operator"
                and nv.upper() not in ("AND", "OR"))

    def _parse_conditions(self) -> list[dict]:
        out = []
        while self.pos < len(self.tokens):
            kind, val = self._cur()
            if kind == "operator" and val.upper() in ("AND", "OR"):
                self._next()
                continue
            if kind == "keyword":
                break
            if self._is_condition():
                cond = self._parse_condition()
                if cond:
                    out.append(cond)
            else:
                break
        return out

    def _parse_condition(self) -> dict | None:
        _, fld = self._cur()
        self._next()
        kind, opv = self._cur()
        if kind != "operator":
            return None
        op = self._normalize_op(opv)
        self._next()
        negate = False
        if self._cur() == ("dash", "-"):
            negate = True
            self._next()
        value = self._parse_value()
        if negate:
            op = _NEGATE.get(op, op)
        return {"field": fld, "operator": op, "value": value}

    def _parse_value(self) -> Any:
        kind, val = self._cur()
        if kind == "bracket" and val == "[":
            self._next()
            vals = []
            while self.pos < len(self.tokens):
                k, v = self._cur()
                if k == "bracket" and v == "]":
                    self._next()
                    break
                if k == "comma":
                    self._next()
                    continue
                vals.append(self._scalar(k, v))
                self._next()
            return vals
        self._next()
        return self._scalar(kind, val)

    @staticmethod
    def _scalar(kind, val):
        if kind == "string":
            return val.strip("\"'")
        if kind == "number":
            return float(val) if "." in val else int(val)
        return val

    def _parse_fields(self) -> list[str]:
        fields = []
        while self.pos < len(self.tokens):
            kind, val = self._cur()
            if kind == "keyword" or self._is_condition():
                break
            if kind == "field":
                fields.append(val)
                self._next()
            elif kind == "comma":
                self._next()
            else:
                break
        return fields

    def _parse_sort(self) -> dict[str, str]:
        sort = {}
        while self.pos < len(self.tokens):
            kind, val = self._cur()
            if kind == "keyword" or self._is_condition():
                break
            direction = "asc"
            if kind == "dash":
                direction = "desc"
                self._next()
                kind, val = self._cur()
            if kind == "field":
                sort[val] = direction
                self._next()
            elif kind == "comma":
                self._next()
            else:
                break
        return sort

    def _parse_pagination(self, kw: str, q: SearchQuery) -> None:
        kind, val = self._cur()
        if kw == "PAGE":
            page_num, page_size = 1, 10
            if kind == "number":
                page_num = int(float(val))
                self._next()
                if self._cur()[0] == "comma":
                    self._next()
                    k2, v2 = self._cur()
                    if k2 == "number":
                        page_size = int(float(v2))
                        self._next()
            q.limit = page_size
            q.offset = (page_num - 1) * page_size
        elif kw == "LIMIT" and kind == "number":
            q.limit = int(float(val))
            self._next()
        elif kw == "OFFSET" and kind == "number":
            q.offset = int(float(val))
            self._next()

    @staticmethod
    def _normalize_op(op: str) -> str:
        if op == "=?":
            return "=?"
        return {"=": "=", "!=": "!=", ">": ">", "<": "<", ">=": ">=",
                "<=": "<=", "LIKE": "like", "IN": "in",
                "NOT IN": "not in"}.get(re.sub(r"\s+", " ", op.upper()), "=")


_NEGATE = {"=": "!=", "!=": "=", "=?": "!=", ">": "<=", "<": ">=",
           ">=": "<", "<=": ">", "like": "not like", "in": "not in",
           "not in": "in"}


def _coerce(value: Any) -> Any:
    if isinstance(value, str):
        if "," in value:
            return [v.strip() for v in value.split(",")]
        if value == "true":
            return True
        if value == "false":
            return False
        if value == "null":
            return None
        try:
            return float(value) if "." in value else int(value)
        except ValueError:
            return value
    return value


class URLQueryParser:
    """JSON-API style: parse({'q': 'error', 'filter': {'role': {'eq':
    'assistant'}}, 'sort': '-ts', 'page': {'limit': 5}})."""

    def parse(self, params: dict) -> SearchQuery:
        q = SearchQuery(query=str(params.get("q", params.get("query", ""))))
        for fld, spec in (params.get("filter") or {}).items():
            if isinstance(spec, dict):
                for op, raw in spec.items():
                    q.filters.append({"field": fld,
                                      "operator": _URL_OP_MAP.get(op.lower(), "="),
                                      "value": _coerce(raw)})
            else:
                value = _coerce(spec)
                op = "in" if isinstance(value, list) else "="
                q.filters.append({"field": fld, "operator": op, "value": value})
        sort = params.get("sort")
        if sort:
            for part in (sort.split(",") if isinstance(sort, str) else sort):
                part = part.strip()
                if part.startswith("-"):
                    q.sort[part[1:]] = "desc"
                elif part:
                    q.sort[part] = "asc"
        page = params.get("page") or {}
        if "limit" in page:
            q.limit = int(page["limit"])
        if "size" in page:
            q.limit = int(page["size"])
        if "offset" in page:
            q.offset = int(page["offset"])
        if "number" in page:
            q.offset = (int(page["number"]) - 1) * q.limit
        if "limit" in params:
            q.limit = int(params["limit"])
        if "offset" in params:
            q.offset = int(params["offset"])
        fz = params.get("fuzzy")
        if fz is not None:
            q.fuzzy = fz in (True, "true", "1", 1)
        hl = params.get("highlight")
        if hl is not None:
            q.highlight = hl in (True, "true", "1", 1)
        for fld, opts in (params.get("facets") or {}).items():
            q.facets[fld] = opts if isinstance(opts, dict) else {}
        for fld, w in (params.get("boost") or {}).items():
            q.boost_fields[fld] = float(w)
        geo = params.get("geo") or {}
        if geo:
            # geo[near][lat/lng/radius[,units]], geo[within][north/south/
            # east/west], geo[sort][lat/lng[,direction]], geo[units]
            # (reference: src/DSL/URLQueryParser.php:200-239)
            near = geo.get("near") or {}
            if {"lat", "lng", "radius"} <= set(near):
                q.geo_filters["near"] = {
                    "lat": float(near["lat"]), "lng": float(near["lng"]),
                    "radius": float(near["radius"]),
                    **({"units": near["units"]} if "units" in near else {})}
            within = geo.get("within") or {}
            if {"north", "south", "east", "west"} <= set(within):
                q.geo_filters["within"] = {
                    k: float(within[k])
                    for k in ("north", "south", "east", "west")}
            gsort = geo.get("sort") or {}
            if {"lat", "lng"} <= set(gsort):
                q.geo_filters["distance_sort"] = {
                    "lat": float(gsort["lat"]), "lng": float(gsort["lng"]),
                    "direction": gsort.get("direction", "asc")}
            if "units" in geo:
                q.geo_filters["units"] = geo["units"]
        if "language" in params:
            q.language = params["language"]
        return q

    def parse_query_string(self, qs: str) -> SearchQuery:
        """Parses `q=...&filter[role][eq]=assistant&sort=-ts&page[limit]=5`
        (PHP parse_str-style bracket nesting)."""
        from urllib.parse import parse_qsl, unquote

        params: dict = {}
        for key, val in parse_qsl(qs, keep_blank_values=True):
            key = unquote(key)
            parts = re.findall(r"([^\[\]]+)", key)
            node = params
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = val
        return self.parse(params)


# Fields auto-prefixed to metadata by the fluent builder (reference default
# list, src/DSL/QueryBuilder.php:38-96 — adapted to the transcript schema)
DEFAULT_METADATA_FIELDS = {
    "category", "price", "rating", "in_stock", "version", "author", "tags",
}


class QueryBuilder:
    """Fluent builder (reference: src/DSL/QueryBuilder.php:241-431)."""

    def __init__(self, metadata_fields: set[str] | None = None):
        self._q = SearchQuery()
        self._meta = metadata_fields if metadata_fields is not None \
            else DEFAULT_METADATA_FIELDS

    def _prefix(self, field: str) -> str:
        return f"metadata.{field}" if field in self._meta else field

    def query(self, text: str) -> "QueryBuilder":
        self._q.query = text
        return self

    def where(self, field: str, op: str, value=None) -> "QueryBuilder":
        self._q.filters.append({"field": self._prefix(field), "operator": op,
                                "value": value})
        return self

    def where_in(self, field: str, values: list) -> "QueryBuilder":
        return self.where(field, "in", values)

    def where_between(self, field: str, lo, hi) -> "QueryBuilder":
        return self.where(field, "between", (lo, hi))

    def where_null(self, field: str) -> "QueryBuilder":
        return self.where(field, "is null")

    def sort_by(self, field: str, direction: str = "asc") -> "QueryBuilder":
        self._q.sort[field] = direction
        return self

    def limit(self, n: int) -> "QueryBuilder":
        self._q.limit = n
        return self

    def offset(self, n: int) -> "QueryBuilder":
        self._q.offset = n
        return self

    def fuzzy(self, on: bool = True) -> "QueryBuilder":
        self._q.fuzzy = on
        return self

    def highlight(self, on: bool = True) -> "QueryBuilder":
        self._q.highlight = on
        return self

    def facet(self, field: str, **opts) -> "QueryBuilder":
        self._q.facets[field] = opts
        return self

    def boost(self, field: str, weight: float) -> "QueryBuilder":
        self._q.boost_fields[field] = weight
        return self

    def near(self, lat: float, lng: float, radius: float,
             units: str | None = None) -> "QueryBuilder":
        self._q.geo_filters["near"] = {"lat": lat, "lng": lng,
                                       "radius": radius,
                                       **({"units": units} if units else {})}
        return self

    def within(self, north: float, south: float, east: float,
               west: float) -> "QueryBuilder":
        self._q.geo_filters["within"] = {"north": north, "south": south,
                                         "east": east, "west": west}
        return self

    def sort_by_distance(self, lat: float, lng: float,
                         direction: str = "asc") -> "QueryBuilder":
        self._q.geo_filters["distance_sort"] = {"lat": lat, "lng": lng,
                                                "direction": direction}
        return self

    def build(self) -> SearchQuery:
        return self._q

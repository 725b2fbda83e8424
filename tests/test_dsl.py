"""DSL parser tests (reference grammar, tests/DSL/* analog)."""

from yetisearch_spark.dsl import QueryBuilder, QueryParser, URLQueryParser


def test_dsl_free_text_only():
    q = QueryParser().parse("hello world search")
    assert q.query == "hello world search"
    assert q.filters == []


def test_dsl_conditions():
    q = QueryParser().parse('error log role = "assistant" AND turn_idx >= 3')
    assert q.query == "error log"
    assert {"field": "role", "operator": "=", "value": "assistant"} in q.filters
    assert {"field": "turn_idx", "operator": ">=", "value": 3} in q.filters


def test_dsl_in_and_like():
    q = QueryParser().parse('q tool IN [bash, python] AND text LIKE "%fail%"')
    ops = {f["operator"]: f for f in q.filters}
    assert ops["in"]["value"] == ["bash", "python"]
    assert ops["like"]["value"] == "%fail%"


def test_dsl_eq_or_empty():
    q = QueryParser().parse('x version =? "1.0"')
    assert q.filters[0]["operator"] == "=?"


def test_dsl_sort_and_pagination():
    q = QueryParser().parse("news SORT -ts, turn_idx PAGE 3,25")
    assert q.sort == {"ts": "desc", "turn_idx": "asc"}
    assert q.limit == 25 and q.offset == 50


def test_dsl_limit_offset():
    q = QueryParser().parse("term LIMIT 7 OFFSET 14")
    assert q.limit == 7 and q.offset == 14


def test_dsl_fuzzy_highlight_flags():
    q = QueryParser().parse("oops FUZZY HIGHLIGHT")
    assert q.fuzzy and q.highlight


def test_url_parser_basic():
    q = URLQueryParser().parse({
        "q": "error trace",
        "filter": {"role": {"eq": "assistant"},
                   "turn_idx": {"gte": "2"},
                   "tool": {"nin": "bash,python"}},
        "sort": "-ts,turn_idx",
        "page": {"limit": "5", "offset": "10"},
        "fuzzy": "true",
    })
    assert q.query == "error trace"
    assert {"field": "role", "operator": "=", "value": "assistant"} in q.filters
    assert {"field": "turn_idx", "operator": ">=", "value": 2} in q.filters
    assert {"field": "tool", "operator": "not in",
            "value": ["bash", "python"]} in q.filters
    assert q.sort == {"ts": "desc", "turn_idx": "asc"}
    assert q.limit == 5 and q.offset == 10 and q.fuzzy


def test_url_parser_page_number():
    q = URLQueryParser().parse({"q": "x", "page": {"number": "3", "size": "20"}})
    assert q.limit == 20 and q.offset == 40


def test_url_parser_query_string():
    q = URLQueryParser().parse_query_string(
        "q=hello&filter[role][eq]=user&sort=-ts&page[limit]=3&highlight=1")
    assert q.query == "hello"
    assert q.filters == [{"field": "role", "operator": "=", "value": "user"}]
    assert q.sort == {"ts": "desc"}
    assert q.limit == 3 and q.highlight


def test_query_builder():
    q = (QueryBuilder()
         .query("spark engine")
         .where("role", "=", "user")
         .where("price", ">=", 10)        # auto-prefixed metadata field
         .where_in("tool", ["bash"])
         .where_between("turn_idx", 0, 5)
         .sort_by("ts", "desc")
         .limit(5).offset(2)
         .fuzzy().highlight()
         .facet("role", limit=3)
         .boost("text", 2.0)
         .build())
    assert q.query == "spark engine"
    assert {"field": "role", "operator": "=", "value": "user"} in q.filters
    assert {"field": "metadata.price", "operator": ">=", "value": 10} in q.filters
    assert q.sort == {"ts": "desc"}
    assert q.limit == 5 and q.offset == 2 and q.fuzzy and q.highlight
    assert q.facets == {"role": {"limit": 3}}
    assert q.boost_fields == {"text": 2.0}

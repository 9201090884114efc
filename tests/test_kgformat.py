"""N-Triples export (operators/kgformat.py): escape semantics, grammar
validity of every emitted line, and the map-only plan.
(Oracle parity runs in test_entry_queries[kg_ntriples].)"""
import re

from pyspark.sql import functions as F

from docee_spark.operators.kgformat import (
    IRI_ESCAPES,
    iri_encode,
    literal_escape,
    to_ntriples,
)

# N-Triples 1.1 grammar subset we emit: IRIREF forbids control chars,
# space and <>"{}|^`\ ; literals are ECHAR-escaped inside quotes
_IRI = r"<[^\x00-\x20<>\"{}|^`\\]*>"
_LIT = r'"(?:[^"\\\n\r]|\\["\\nrt])*"'
_LINE = re.compile(rf"^{_IRI} {_IRI} (?:{_IRI}|{_LIT}) \.$")


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], "x string").select(
        col(F.col("x")).alias("y")
    ).collect()[0]["y"]


class TestEscapes:
    def test_iri_forbidden_set(self, spark):
        got = _one(spark, iri_encode, 'a b<c>d"e{f}g|h^i`j\\k\tl\nm\rn%o')
        assert got == "a%20b%3Cc%3Ed%22e%7Bf%7Dg%7Ch%5Ei%60j%5Ck%09l%0Am%0Dn%25o"

    def test_iri_percent_first_is_injective(self, spark):
        # '%20' in the input must NOT collide with an encoded space
        assert _one(spark, iri_encode, "%20") == "%2520"
        assert _one(spark, iri_encode, " ") == "%20"

    def test_iri_non_ascii_raw(self, spark):
        assert _one(spark, iri_encode, "黄海燕·公司") == "黄海燕·公司"

    def test_literal_echar(self, spark):
        got = _one(spark, literal_escape, 'say "hi"\\\n\t\r')
        assert got == 'say \\"hi\\"\\\\\\n\\t\\r'

    def test_literal_backslash_first_is_injective(self, spark):
        # a literal backslash-n in the input stays distinguishable from
        # an escaped newline
        assert _one(spark, literal_escape, "\\n") == "\\\\n"
        assert _one(spark, literal_escape, "\n") == "\\n"


class TestToNtriples:
    def _kg(self, spark):
        vertices = spark.createDataFrame(
            [("e1", '黄 "海" 燕\\', 3), ("e2", "plain", 1)],
            "entity_id string, surface string, n_mentions int",
        )
        edges = spark.createDataFrame(
            [("e1", "EquityFreeze#Pledger", "e2", "d1", "EquityFreeze")],
            "src string, pred string, dst string, doc_id string, "
            "event_type string",
        )
        return vertices, edges

    def test_every_line_is_grammatical(self, spark):
        lines = [
            r["line"] for r in to_ntriples(*self._kg(spark)).collect()
        ]
        assert len(lines) == 3
        for ln in lines:
            assert _LINE.match(ln), ln

    def test_edge_and_label_shapes(self, spark):
        lines = {r["line"] for r in to_ntriples(*self._kg(spark)).collect()}
        assert (
            "<urn:docee:ent:e1> <urn:docee:pred:EquityFreeze#Pledger> "
            "<urn:docee:ent:e2> ." in lines
        )
        assert (
            '<urn:docee:ent:e2> <http://www.w3.org/2000/01/rdf-schema#label>'
            ' "plain" .' in lines
        )
        # the nasty surface round-trips through ECHAR escapes
        assert any('\\"海\\"' in ln and "\\\\" in ln for ln in lines)

    def test_map_only_plan(self, spark):
        v, e = self._kg(spark)
        df = to_ntriples(v, e)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        assert "Join" not in plan, plan
        assert "EvalPython" not in plan, plan

    def test_escape_tables_stay_ordered(self):
        # '%' must be the FIRST iri escape and backslash the first
        # literal escape — the injectivity of the whole chain rests on it
        assert IRI_ESCAPES[0] == ("%", "%25")
        assert IRI_ESCAPES[1][0] == "\\"

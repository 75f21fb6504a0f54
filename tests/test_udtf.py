"""Python UDTF surface (SURVEY.md §2.10): a real ``@udtf`` table
function driven through a LATERAL join, pinned equal to the JVM
``posexplode(split(...))`` form.

The engine's graded query paths keep explosions JVM-side (posexplode
— see operators/ throughout); this test demonstrates the §2.10
user-defined-table-function surface itself: Spark 4 plans the Python
UDTF as an Arrow-batched evaluation per input row with a declared
output schema, the shape a bespoke per-document expander (e.g. a
custom case-section splitter the reference implements imperatively in
hays.py) would take when no built-in fits."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="ord: int, sentence: string")
class _SentenceSplit:
    def eval(self, text: str):
        parts = [p for p in (text or "").split(". ") if p]
        for i, p in enumerate(parts):
            yield i, p


_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_udtf_lateral_equals_jvm_posexplode(spark, tmp_path):
    texts = [
        "alpha one. beta two. gamma three",
        "single sentence",
        "trail dot. ",
        "",
    ]
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, _SCHEMA).createOrReplaceTempView("udtf_docs")
    spark.udtf.register("sentence_split", _SentenceSplit)
    via_udtf = spark.sql(
        "SELECT d.doc_id, t.ord, t.sentence"
        " FROM udtf_docs d, LATERAL sentence_split(d.text) t"
    )
    via_jvm = (
        spark.table("udtf_docs")
        .select(
            "doc_id",
            F.posexplode(
                F.filter(F.split("text", r"\. "), lambda p: p != "")
            ).alias("ord", "sentence"),
        )
    )
    a = sorted(tuple(r) for r in via_udtf.collect())
    b = sorted(tuple(r) for r in via_jvm.collect())
    assert a == b
    # empty text yields no rows on both paths
    assert not [r for r in a if r[0] == 3]
    # multi-sentence doc is ordinal-stable
    assert [r[2] for r in a if r[0] == 0] == [
        "alpha one",
        "beta two",
        "gamma three",
    ]

"""extract_field parity: the reference deletes empty tokens before
indexing and leaves the event unchanged on an out-of-range index
(libbeat/processors/actions/extract_field.go:86-92 — deleteEmpty +
bounds check).  The flat-column analogs: index counts NON-EMPTY
tokens, out-of-range yields NULL instead of aborting (Spark 4 ANSI
element_at would kill the job on the first short string)."""

from pyspark.sql import functions as F

from beats_spark.operators.actions import ExtractField


def _df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")


def _vals(df, col="tok"):
    return [r[col] for r in df.orderBy("id").collect()]


class TestExtractField:
    def test_basic_nth_token(self, spark):
        df = _df(spark, ["alpha beta gamma"])
        out = ExtractField(field="text", separator=" ", index=1, target="tok").apply(df)
        assert _vals(out) == ["beta"]

    def test_leading_separator_does_not_shift(self, spark):
        # reference: strings.Split -> ["", "a", "b"]; deleteEmpty -> ["a", "b"]
        df = _df(spark, [" a b", "a b"])
        out = ExtractField(field="text", separator=" ", index=0, target="tok").apply(df)
        assert _vals(out) == ["a", "a"]

    def test_doubled_separator_collapses(self, spark):
        df = _df(spark, ["a  b"])
        out = ExtractField(field="text", separator=" ", index=1, target="tok").apply(df)
        assert _vals(out) == ["b"]

    def test_out_of_range_is_null_not_abort(self, spark):
        # reference returns an error + unchanged event; unset == NULL here.
        # Under ANSI mode element_at() would raise INVALID_ARRAY_INDEX.
        df = _df(spark, ["only two", "one two three four"])
        out = ExtractField(field="text", separator=" ", index=3, target="tok").apply(df)
        assert _vals(out) == [None, "four"]

    def test_null_source_yields_null(self, spark):
        df = spark.createDataFrame([(0, None)], "id int, text string")
        out = ExtractField(field="text", separator=" ", index=0, target="tok").apply(df)
        assert _vals(out) == [None]

    def test_guarded_rows_untouched(self, spark):
        df = _df(spark, ["keep me", "skip me"]).withColumn("tok", F.lit("old"))
        out = ExtractField(field="text", separator=" ", index=0, target="tok").apply(
            df, guard=F.col("id") == 0
        )
        assert _vals(out) == ["keep", "old"]

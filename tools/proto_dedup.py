"""Scratch: measure row-local simhash + collect_list ngram-jaccard
against the current implementations at sf0.1.  Not part of the engine.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from olap_storage_engine_spark import get_spark
from olap_storage_engine_spark.functions.hashes import md5int
from olap_storage_engine_spark.functions.textfns import tokens
from olap_storage_engine_spark.operators import dedup as dd
from olap_storage_engine_spark.operators.dedup import _spread, shingles
from olap_storage_engine_spark.sources.testdata import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def simhash_rowlocal(docs, bits=32, text_col="text", id_col="doc_id"):
    toked = _spread(docs).select(
        F.col(id_col),
        F.array_distinct(tokens(F.col(text_col))).alias("__toks"),
    )
    hs = F.transform(F.col("__toks"), lambda t: md5int(t))
    zero = F.array_repeat(F.lit(0).cast("long"), bits)
    sums = F.aggregate(
        hs,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                    )
                    .otherwise(F.lit(-1))
                    .cast("long")
                    for j in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    withs = toked.select(F.col(id_col), sums.alias("__s"))
    fp = None
    for j in range(bits):
        bit = F.when(
            F.element_at(F.col("__s"), j + 1) > 0, F.lit(2 ** j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp + bit
    return withs.select(F.col(id_col), fp.alias("simhash"))


def ngram_jaccard_grouped(
    docs, n=5, threshold=0.5, max_doc_freq=50, text_col="text", id_col="doc_id"
):
    sh = shingles(docs, n, text_col, id_col, with_size=True)
    grouped = (
        sh.groupBy("shingle")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), F.col("sz").alias("sz"))
                )
            ).alias("ds")
        )
        .filter((F.size("ds") >= 2) & (F.size("ds") <= max_doc_freq))
    )
    ds = F.col("ds")
    pairs_arr = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.greatest(F.size(ds) - i - 1, F.lit(0))),
                lambda y: F.struct(
                    x["id"].alias("a"),
                    x["sz"].alias("sa"),
                    y["id"].alias("b"),
                    y["sz"].alias("sb"),
                ),
            ),
        )
    )
    p = grouped.select(F.explode(pairs_arr).alias("p")).select(
        F.col("p.a").alias("doc_a"),
        F.col("p.sa").alias("sz_a"),
        F.col("p.b").alias("doc_b"),
        F.col("p.sb").alias("sz_b"),
    )
    common = p.groupBy("doc_a", "doc_b", "sz_a", "sz_b").agg(
        F.count(F.lit(1)).alias("common")
    )
    return (
        common.withColumn(
            "jaccard",
            F.col("common")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def run(tag, df):
    import gc

    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    df.sparkSession.catalog.clearCache()
    gc.collect()
    print(f"MEASURE {tag} {dt:.3f}s", flush=True)
    return dt


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents")
    # warmup
    spark.range(100000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    # correctness: new == old
    old_sh = {tuple(r) for r in dd.simhash(docs, bits=32).collect()}
    new_sh = {tuple(r) for r in simhash_rowlocal(docs, bits=32).collect()}
    print("SIMHASH_EQ", old_sh == new_sh, len(old_sh), len(new_sh), flush=True)

    old_j = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in dd.ngram_jaccard_pairs(docs, 5, 0.5, 50).collect()
    }
    new_j = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_grouped(docs, 5, 0.5, 50).collect()
    }
    print("JACCARD_EQ", old_j == new_j, len(old_j), len(new_j), flush=True)

    spark.catalog.clearCache()
    for i in range(3):
        run("simhash_old", dd.simhash(docs, bits=32))
        run("simhash_new", simhash_rowlocal(docs, bits=32))
        run("jaccard_old", dd.ngram_jaccard_pairs(docs, 5, 0.5, 50))
        run("jaccard_new", ngram_jaccard_grouped(docs, 5, 0.5, 50))


if __name__ == "__main__":
    main()

"""Per-stage cost probe for the html_to_text chain (round 15, r14
verdict #3): times cumulative prefixes of the rule chain over the
corpus_clean html fixture at a given SF, so the consolidation work is
driven by measured stage costs, not guesses.

Usage: python tools/html_cost_probe.py [sf_dir] [runs]
Prints one JSON line: {"stage": seconds, ...} (min over runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from petk_spark.operators import text as T
from petk_spark.sources.tables import read_table


def fixture(spark, sf_dir):
    html_col = F.concat(
        F.lit(
            "<html><head><script>var a=1;</script><style>p{}</style>"
            "</head><body><h1>"
        ),
        F.col("c_name"),
        F.lit("</h1><p>"),
        F.col("c_mktsegment"),
        F.lit(
            " &amp; co &#8211; d&#x2019;arc &amp;lt;esc&amp;gt;"
            " &#0169; &quot;q&#34; &mdash;x&rsquo;s&hellip;"
            " &copy;2024 &laquo;q&raquo; 5&deg; a&middot;b t&trade;"
            " &NDASH; &amp;mdash; e&euro;</p><ul><li>k-"
        ),
        F.col("c_custkey").cast("string"),
        F.lit("</li></ul><!-- note --></body></html>"),
    )
    return read_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 10 == 1
    ).select(F.col("c_custkey"), html_col.alias("h"))


def chain_prefix(col, n_struct=99, n_lit=99, n_re=99, n_ws=99):
    e = col
    for pat, rep in T._HTML_RULES[:n_struct]:
        e = F.regexp_replace(e, pat, rep)
    lits = [r for r in T._HTML_ENTITIES if r[0] == "lit"]
    res = [r for r in T._HTML_ENTITIES if r[0] == "re"]
    for _, ent, rep in lits[:n_lit]:
        e = F.replace(e, F.lit(ent), F.lit(rep))
    for _, ent, rep in res[:n_re]:
        e = F.regexp_replace(e, ent, rep)
    for pat, rep in T._WS_RULES[:n_ws]:
        e = F.regexp_replace(e, pat, rep)
    return F.trim(e)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = fixture(spark, sf_dir)
    df.cache().count()

    stages = {
        "baseline_md5": lambda c: c,
        "structural4": lambda c: chain_prefix(c, 99, 0, 0, 0),
        "plus_lit4": lambda c: chain_prefix(c, 99, 99, 0, 0),
        "plus_re22": lambda c: chain_prefix(c, 99, 99, 99, 0),
        "full_chain": lambda c: chain_prefix(c),
        "current_html_to_text": lambda c: T.html_to_text(c),
    }
    if hasattr(T, "html_to_text_v2"):
        stages["v2"] = lambda c: T.html_to_text_v2(c)

    out = {}
    for name, fn in stages.items():
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.select(F.md5(fn(F.col("h"))).alias("m")).agg(
                F.count("m"), F.min("m")
            ).collect()
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts), 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""URL/domain feature functions and the per-domain rollup operator."""

from pyspark.sql import functions as F

from pygridmap_spark.functions import urls as U
from pygridmap_spark.operators import domains as DM


def _feats(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.site3.co.uk/cat2/123?x=1"),
            (2, "http://sub.a.site3.co.uk/"),
            (3, "https://example.com/a/b/c"),
            (4, "https://co.uk/"),  # bare public suffix
            (5, "https://host.unknown-tld/x"),
            (6, "https://UPPER.Example.COM/p"),
        ],
        "doc_id long, url string",
    )
    return df, U.with_url_features(df)


def test_url_features(spark):
    _, feats = _feats(spark)
    got = {r.doc_id: (r.host, r.registered_domain, r.path_depth) for r in feats.collect()}
    assert got[1] == ("www.site3.co.uk", "site3.co.uk", 2)  # query string excluded
    assert got[2] == ("sub.a.site3.co.uk", "site3.co.uk", 0)
    assert got[3] == ("example.com", "example.com", 3)
    # a host that IS a suffix has no registrable label (must not fall
    # through to the shorter 'uk' rule)
    assert got[4] == ("co.uk", None, 0)
    assert got[5][1] is None  # unknown TLD
    assert got[6] == ("upper.example.com", "example.com", 1)  # lowercased


def test_domain_rollup(spark):
    df, _ = _feats(spark)
    got = {
        r.registered_domain: (r.n_docs, r.n_hosts, r.avg_path_depth)
        for r in DM.domain_rollup(df).collect()
    }
    assert got["site3.co.uk"] == (2, 2, 1.0)
    assert got["example.com"] == (2, 2, 2.0)
    # NULL-domain rows are kept so totals reconcile
    assert sum(v[0] for v in got.values()) == 6

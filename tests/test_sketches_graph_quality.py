"""Crafted-input semantics for the round-10 additions — sketches
(plans/sketches.py), PageRank (plans/graph.py), DQ/SCD2
(plans/quality.py), association pairs and the salted join. Oracle hash
parity runs in tools/selfcheck.py like every library query; these pin
the properties a hash oracle can't state (estimator bounds, invariance
to salting, conservation laws, crafted violation counts)."""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from w4h_etl_container_spark.plans.registry import load_library

LIB = load_library()

SIDE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings",
)


def _mkdir_with_events(tmp_path_factory, name: str, rows) -> str:
    """A fixture dir: crafted events + the sf0.001 side tables."""
    d = str(tmp_path_factory.mktemp(name))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    for t in SIDE_TABLES:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", os.path.join(d, f"{t}.parquet"))
    return d


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 3, 1, h, m, s)


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------
class TestKmv:
    def test_small_group_is_exact(self, spark, tmp_path_factory):
        # 7 distinct users < K=32 → the sketch IS the set: est == exact == 7
        rows = [
            (i, _ts(1, i), u, "click", 1.0, None)
            for i, u in enumerate([10, 11, 12, 13, 14, 15, 16] * 3)
        ]
        d = _mkdir_with_events(tmp_path_factory, "kmv_small", rows)
        out = {r["event_type"]: r for r in LIB["q_kmv_distinct"].fn(spark, d).collect()}
        r = out["click"]
        assert r["n_mins"] == 7
        assert r["exact_users"] == 7
        assert r["est_users"] == 7.0

    def test_kth_min_matches_brute_force(self, spark, tmp_path_factory):
        # 200 distinct users > K → kth_min must be the 32nd-smallest
        # 60-bit md5 prefix, computed independently here
        users = list(range(1000, 1200))
        rows = [(i, _ts(2, i % 60, i % 60), u, "view", 1.0, None) for i, u in enumerate(users)]
        d = _mkdir_with_events(tmp_path_factory, "kmv_brute", rows)
        out = {r["event_type"]: r for r in LIB["q_kmv_distinct"].fn(spark, d).collect()}
        hashes = sorted(
            int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) for u in users
        )
        assert out["view"]["kth_min"] == hashes[31]
        assert out["view"]["n_mins"] == 32
        est = 31.0 * float(1 << 60) / float(hashes[31])
        assert abs(out["view"]["est_users"] - est) < 1e-5

    def test_fixture_estimate_in_error_band(self, spark, sf_dir):
        # K=32 → stderr ≈ 1/sqrt(30) ≈ 18%; allow a generous 3σ band
        for r in LIB["q_kmv_distinct"].fn(spark, sf_dir).collect():
            if r["n_mins"] == 32:
                assert abs(r["est_users"] - r["exact_users"]) / r["exact_users"] < 0.6
            else:
                assert r["est_users"] == float(r["exact_users"])


# ---------------------------------------------------------------------------
# Count-min heavy hitters
# ---------------------------------------------------------------------------
class TestCountMin:
    def test_overestimate_invariant(self, spark, sf_dir):
        rows = LIB["q_heavy_hitters"].fn(spark, sf_dir).collect()
        assert len(rows) == 10
        assert all(r["cms_cnt"] >= r["true_cnt"] for r in rows)

    def test_single_key_stream_is_exact(self, spark, tmp_path_factory):
        # one user only → its 4 cells hold exactly its count
        rows = [(i, _ts(3, i % 60), 42, "click", 1.0, None) for i in range(25)]
        d = _mkdir_with_events(tmp_path_factory, "cms_single", rows)
        out = LIB["q_heavy_hitters"].fn(spark, d).collect()
        assert len(out) == 1
        assert out[0]["user_id"] == 42
        assert out[0]["true_cnt"] == 25
        assert out[0]["cms_cnt"] == 25

    def test_sketch_is_256_cells(self, spark, sf_dir):
        # the scale claim: the sketch never exceeds d*w rows
        from w4h_etl_container_spark.plans.sketches import CMS_D, CMS_W, _cms_bucket
        from w4h_etl_container_spark.session import read_events

        ev = read_events(spark, sf_dir).where(F.col("user_id").isNotNull())
        cells = (
            ev.select(
                F.posexplode(
                    F.array(*[_cms_bucket(F.col("user_id"), r) for r in range(CMS_D)])
                ).alias("r", "bucket")
            )
            .groupBy("r", "bucket")
            .count()
        )
        assert cells.count() <= CMS_D * CMS_W


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------
class TestPageRank:
    def _rank_dict(self, spark, d):
        return {
            r["node_id"]: r["rank_pico"]
            for r in LIB["q_pagerank"].fn(spark, d).collect()
        }

    @pytest.fixture(scope="class")
    def crafted_dir(self, tmp_path_factory):
        """lineitem with a known bipartite structure: part 1 sold by
        suppliers 1..4 (hub), parts 2..4 each sold only by supplier 1."""
        d = str(tmp_path_factory.mktemp("pr_crafted"))
        pairs = [(1, s) for s in (1, 2, 3, 4)] + [(p, 1) for p in (2, 3, 4)]
        pdf = pd.DataFrame(
            [
                (i + 1, pk, sk, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
                for i, (pk, sk) in enumerate(pairs)
            ],
            columns=[
                "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus", "l_shipdate",
            ],
        )
        pdf.to_parquet(os.path.join(d, "lineitem.parquet"), index=False)
        return d

    def test_hubs_outrank_leaves(self, spark, crafted_dir):
        ranks = self._rank_dict(spark, crafted_dir)
        # part 1 (node 2) and supplier 1 (node 3) are the two hubs
        hub_part, hub_supp = ranks[2], ranks[3]
        leaves = [v for k, v in ranks.items() if k not in (2, 3)]
        assert hub_part > max(leaves)
        assert hub_supp > max(leaves)

    def test_mass_approximately_conserved(self, spark, crafted_dir):
        # Σ rank ≈ SCALE: integer floor-div loses < 1 unit per edge per
        # iteration; the bound is loose but catches a lost damping term
        from w4h_etl_container_spark.plans.graph import PR_SCALE

        ranks = self._rank_dict(spark, crafted_dir)
        total = sum(ranks.values())
        assert abs(total - PR_SCALE) < PR_SCALE * 0.01

    def test_symmetric_pair_has_equal_ranks(self, spark, tmp_path_factory):
        # a single (part, supplier) pair → 2-cycle → identical ranks
        d = str(tmp_path_factory.mktemp("pr_pair"))
        pdf = pd.DataFrame(
            [(1, 7, 9, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))],
            columns=[
                "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus", "l_shipdate",
            ],
        )
        pdf.to_parquet(os.path.join(d, "lineitem.parquet"), index=False)
        ranks = self._rank_dict(spark, d)
        assert ranks[14] == ranks[19]


# ---------------------------------------------------------------------------
# DQ expectation suite
# ---------------------------------------------------------------------------
class TestDqReport:
    def test_fixture_report(self, spark, sf_dir):
        # the suite earns its keep on the driver's own fixture: the
        # synthetic lineitem reuses (l_orderkey, l_linenumber) pairs —
        # a REAL finding both engines agree on (selfcheck hash-green);
        # every other expectation holds
        rows = {r["constraint_name"]: r for r in LIB["q_dq_report"].fn(spark, sf_dir).collect()}
        assert len(rows) == 8
        assert rows["lineitem_pk_unique"]["n_violations"] > 0
        clean = {k: v for k, v in rows.items() if k != "lineitem_pk_unique"}
        assert all(r["n_violations"] == 0 for r in clean.values())

    def test_crafted_violations_are_counted(self, spark, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("dq_bad"))
        for t in SIDE_TABLES:
            shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", os.path.join(d, f"{t}.parquet"))
        orders = pd.read_parquet(os.path.join(d, "orders.parquet"))
        bad = orders.head(3).copy()
        bad["o_orderkey"] = [10**9, 10**9, 10**9 + 1]  # 1 duplicate pk pair
        bad.loc[bad.index[0], "o_totalprice"] = -5.0  # 1 price violation
        bad["o_custkey"] = 10**9  # 3 dangling FKs
        pd.concat([orders, bad]).to_parquet(os.path.join(d, "orders.parquet"), index=False)
        rows = {r["constraint_name"]: r for r in LIB["q_dq_report"].fn(spark, d).collect()}
        n = len(orders) + 3
        assert rows["orders_totalprice_positive"]["n_checked"] == n
        assert rows["orders_totalprice_positive"]["n_violations"] == 1
        assert rows["orders_orderkey_unique"]["n_violations"] == 1
        assert rows["orders_custkey_in_customer"]["n_violations"] == 3
        # lineitem constraints untouched by the orders corruption
        assert rows["lineitem_orderkey_in_orders"]["n_violations"] == 0


# ---------------------------------------------------------------------------
# SCD Type-2
# ---------------------------------------------------------------------------
class TestScd2:
    def test_runs_compress_and_intervals_chain(self, spark, tmp_path_factory):
        # user 1: A A B A → 3 intervals; user 2: single event → 1 current
        rows = [
            (1, _ts(1), 1, "click", 1.0, None),
            (2, _ts(2), 1, "click", 1.0, None),
            (3, _ts(3), 1, "view", 1.0, None),
            (4, _ts(4), 1, "click", 1.0, None),
            (5, _ts(1), 2, "purchase", 1.0, None),
        ]
        d = _mkdir_with_events(tmp_path_factory, "scd2", rows)
        out = LIB["q_scd2"].fn(spark, d).orderBy("user_id", "valid_from").collect()
        u1 = [r for r in out if r["user_id"] == 1]
        assert [r["state"] for r in u1] == ["click", "view", "click"]
        # half-open chain: each valid_to is the next valid_from
        assert u1[0]["valid_to"] == u1[1]["valid_from"]
        assert u1[1]["valid_to"] == u1[2]["valid_from"]
        assert u1[2]["valid_to"] is None and u1[2]["is_current"]
        assert sum(r["is_current"] for r in out) == 2

    def test_duplicate_ts_breaks_on_event_id(self, spark, tmp_path_factory):
        # two different states at the SAME instant: event_id orders them
        rows = [
            (10, _ts(5), 3, "view", 1.0, None),
            (11, _ts(5), 3, "click", 1.0, None),
        ]
        d = _mkdir_with_events(tmp_path_factory, "scd2_ties", rows)
        out = LIB["q_scd2"].fn(spark, d).where(F.col("user_id") == 3).orderBy("event_id" if False else "valid_from", "state").collect()
        states = [r["state"] for r in sorted(out, key=lambda r: (r["is_current"],))]
        assert len(out) == 2
        # event 10 (view) first, event 11 (click) current
        cur = [r for r in out if r["is_current"]][0]
        assert cur["state"] == "click"


# ---------------------------------------------------------------------------
# Association pairs + salted join
# ---------------------------------------------------------------------------
class TestAssocAndSalt:
    def test_assoc_lift_on_crafted_baskets(self, spark, tmp_path_factory):
        # brands X,Y always together (lift > 1), X,Z never → no row
        d = str(tmp_path_factory.mktemp("assoc"))
        for t in SIDE_TABLES:
            shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", os.path.join(d, f"{t}.parquet"))
        part = pd.DataFrame(
            [(1, "pX", "X", "t", 1, 1.0), (2, "pY", "Y", "t", 1, 1.0), (3, "pZ", "Z", "t", 1, 1.0)],
            columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
        )
        part.to_parquet(os.path.join(d, "part.parquet"), index=False)
        li = pd.DataFrame(
            [
                (o, pk, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
                for o in range(1, 11)
                for ln, pk in enumerate([1, 2] if o <= 8 else [3])
            ],
            columns=[
                "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus", "l_shipdate",
            ],
        )
        li.to_parquet(os.path.join(d, "lineitem.parquet"), index=False)
        out = LIB["q_assoc_pairs"].fn(spark, d).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["brand_a"], r["brand_b"]) == ("X", "Y")
        assert r["pair_cnt"] == 8 and r["cnt_a"] == 8 and r["cnt_b"] == 8
        # lift = N * 8 / (8*8) = 10/8 = 1.25
        assert r["lift_e6"] == 1_250_000

    def test_salted_join_matches_plain_join(self, spark, sf_dir):
        from w4h_etl_container_spark.session import read_events, read_table

        salted = {
            r["c_mktsegment"]: (r["n_events"], r["sum_value_e6"])
            for r in LIB["q_salted_join"].fn(spark, sf_dir).collect()
        }
        ev = read_events(spark, sf_dir)
        cust = read_table(spark, sf_dir, "customer")
        e6 = F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
        plain = {
            r["c_mktsegment"]: (r["n"], r["s"])
            for r in ev.join(cust, ev["user_id"] == cust["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(e6).alias("s"))
            .collect()
        }
        assert salted == plain

    def test_salted_plan_joins_on_salt(self, spark, sf_dir):
        plan = LIB["q_salted_join"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "salt" in plan


class TestTableDigest:
    def test_identical_tables_diff_empty(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.quality import digest_diff

        d1 = LIB["q_table_digest"].fn(spark, sf_dir)
        d2 = LIB["q_table_digest"].fn(spark, sf_dir)
        assert digest_diff(d1, d2).count() == 0

    def test_single_cell_corruption_flips_exactly_its_bucket(self, spark, sf_dir, tmp_path):
        """The anti-entropy property the operator exists for: corrupt
        ONE row's payload in a copy and the diff names exactly that
        row's bucket — every other bucket still matches."""
        import os

        from pyspark.sql import functions as F

        from w4h_etl_container_spark.plans.quality import digest_diff

        d = str(tmp_path / "corrupt-sf")
        os.makedirs(d)
        from w4h_etl_container_spark.session import read_table

        li = read_table(spark, sf_dir, "lineitem")
        # flip one row's returnflag (the payload column in the digest)
        victim = li.orderBy("l_orderkey", "l_linenumber").limit(1).collect()[0]
        corrupted = li.withColumn(
            "l_returnflag",
            F.when(
                (F.col("l_orderkey") == victim["l_orderkey"])
                & (F.col("l_linenumber") == victim["l_linenumber"]),
                F.lit("CORRUPT"),
            ).otherwise(F.col("l_returnflag")),
        )
        corrupted.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")

        good = LIB["q_table_digest"].fn(spark, sf_dir)
        bad = LIB["q_table_digest"].fn(spark, d)
        diff = digest_diff(good, bad).collect()
        assert len(diff) == 1
        assert diff[0]["bucket"] == victim["l_orderkey"] % 64
        # row COUNTS agree — only the digest sees the corruption
        assert diff[0]["n_rows_mine"] == diff[0]["n_rows_theirs"]

    def test_generic_digest_matches_declared_query(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from w4h_etl_container_spark.plans.quality import table_digest
        from w4h_etl_container_spark.session import read_table

        li = read_table(spark, sf_dir, "lineitem")
        nul = F.lit("∅")
        row = F.concat_ws(
            ":",
            F.coalesce(F.col("l_orderkey").cast("string"), nul),
            F.coalesce(F.col("l_linenumber").cast("string"), nul),
            F.coalesce(
                F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
                .cast("long")
                .cast("string"),
                nul,
            ),
            F.coalesce(F.col("l_returnflag"), nul),
        )
        got = {
            r["bucket"]: (r["n_rows"], r["digest"])
            for r in table_digest(li, F.col("l_orderkey"), row).collect()
        }
        want = {
            r["bucket"]: (r["n_rows"], r["digest"])
            for r in LIB["q_table_digest"].fn(spark, sf_dir).collect()
        }
        assert got == want

"""Partitioned Bloom filter seen-set + cuckoo variant (SURVEY.md O2).

north_star: "URL-seen membership is a partitioned Bloom filter (with a
cuckoo-filter variant for deletable entries) built via pandas/Arrow UDAFs
over canonicalized+murmur3-hashed URLs".

Design:
- the url_hash space is split into P partitions by pmod(murmur3(url), P);
  each partition owns an m-bit array
- build: one ``applyInPandas`` pass per partition computes its bit array
  (numpy, vectorized Kirsch-Mitzenmacher double hashing from the two
  independent JVM-side hashes xxhash64 + murmur3 — no Python hashing at
  all); arrays are OR-merged into the persisted filter
- probe: candidates carry (pid, h1, h2) columns; an Arrow-batched pandas UDF
  tests k probe bits against the broadcast bit arrays
- ``prefilter``: definitively-new rows (no false negatives) skip the
  anti-join entirely; only probable-duplicates shuffle against the seen
  table. At 10^10 URLs with ~1% discovery-duplication this removes ~99% of
  the anti-join's build-side traffic.

Sandbox sizing: P=32, 10 bits/key → ~1.2% FPR at capacity. At cluster scale
the bit arrays live in a parquet artifact co-partitioned with the candidate
buckets instead of a driver broadcast; the probe math is unchanged.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


BLOOM_SCHEMA = T.StructType([
    T.StructField("pid", T.IntegerType()),
    T.StructField("bitset", T.BinaryType()),
    T.StructField("m", T.LongType()),
    T.StructField("k", T.LongType()),
    T.StructField("n_added", T.LongType()),
])


class PartitionedBloom:
    def __init__(self, partitions: int = 32, capacity: int = 1 << 20,
                 bits_per_key: int = 10):
        self.P = partitions
        total_bits = capacity * bits_per_key
        m = max(1024, total_bits // partitions)
        self.m = (m + 63) // 64 * 64
        self.k = max(1, int(round(bits_per_key * math.log(2))))
        self.bits = np.zeros((self.P, self.m // 8), dtype=np.uint8)
        self.n_added = 0
        self._bc = None  # cached broadcast of self.bits (invalidated on add)

    def _broadcast(self, spark: SparkSession):
        """Broadcast the bit matrix ONCE and reuse it across probe calls /
        cycles; add() invalidates. Without this every cycle re-shipped the
        whole array to every executor."""
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(self.bits)
        return self._bc

    def _invalidate_broadcast(self) -> None:
        if self._bc is not None:
            try:
                self._bc.unpersist()
            except Exception:
                pass
            self._bc = None

    # -- hashing (JVM-side) -------------------------------------------------
    def _with_hashes(self, df: DataFrame, col: str) -> DataFrame:
        return (df
                .withColumn("_h1", F.xxhash64(F.col(col)))
                .withColumn("_h2", F.hash(F.col(col)).cast("long"))
                .withColumn("_pid", F.pmod(F.hash(F.col(col)), F.lit(self.P))))

    def _probe_positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(n, k) probe bit positions via double hashing, uint64 wraparound."""
        u1 = h1.astype(np.uint64)
        u2 = (h2.astype(np.uint64) | np.uint64(1))  # odd step
        j = np.arange(self.k, dtype=np.uint64)
        return ((u1[:, None] + j[None, :] * u2[:, None])
                % np.uint64(self.m)).astype(np.int64)

    # -- build ---------------------------------------------------------------
    def add(self, spark: SparkSession, df: DataFrame, col: str = "url") -> int:
        """Distributed per-partition bit-array build (applyInPandas UDAF);
        arrays OR-merge into the filter. Returns rows added."""
        m, k = self.m, self.k
        probe = self._probe_positions

        schema = T.StructType([
            T.StructField("pid", T.IntegerType()),
            T.StructField("bitset", T.BinaryType()),
            T.StructField("n", T.LongType()),
        ])

        def build(key, pdf):
            pid = int(key[0])
            bits = np.zeros(m // 8, dtype=np.uint8)
            pos = probe(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy()).ravel()
            np.bitwise_or.at(bits, pos >> 3,
                             (1 << (pos & 7)).astype(np.uint8))
            return pd.DataFrame({"pid": [pid], "bitset": [bits.tobytes()],
                                 "n": [len(pdf)]})

        hashed = self._with_hashes(df, col).select("_h1", "_h2", "_pid")
        rows = hashed.groupBy("_pid").applyInPandas(build, schema=schema).collect()
        total = 0
        for r in rows:
            self.bits[r["pid"]] |= np.frombuffer(r["bitset"], dtype=np.uint8)
            total += r["n"]
        self.n_added += total
        if total:
            self._invalidate_broadcast()
        return total

    # -- probe ---------------------------------------------------------------
    def maybe_seen_flag(self, spark: SparkSession, df: DataFrame,
                        col: str = "url",
                        flag: str = "_maybe_seen") -> DataFrame:
        """Adds a boolean column: False ⇒ definitively never seen."""
        m, k = self.m, self.k
        probe = self._probe_positions
        bc = self._broadcast(spark)

        @F.pandas_udf(T.BooleanType())
        def test(h1: pd.Series, h2: pd.Series, pid: pd.Series) -> pd.Series:
            bits = bc.value
            pos = probe(h1.to_numpy(), h2.to_numpy())  # (n, k)
            pid_np = pid.to_numpy()
            byte = bits[pid_np[:, None], pos >> 3]
            hit = (byte & (1 << (pos & 7)).astype(np.uint8)) != 0
            return pd.Series(hit.all(axis=1))

        return (self._with_hashes(df, col)
                .withColumn(flag, test(F.col("_h1"), F.col("_h2"), F.col("_pid")))
                .drop("_h1", "_h2", "_pid"))

    def maybe_seen_flag_cogrouped(self, spark: SparkSession, df: DataFrame,
                                  col: str = "url",
                                  flag: str = "_maybe_seen") -> DataFrame:
        """Co-partitioned probe — the parquet-artifact path: no driver-side
        broadcast of the whole bit matrix. The bitset table is keyed by pid;
        candidates shuffle by pid and each task receives ONLY its own
        partition's bit array via cogroup. At 10^10 keys (~12 GB of bits)
        the broadcast probe would ship the full matrix to every executor;
        here each of the P partition arrays travels exactly once, to the
        task that owns that url_hash range. Result is identical to
        ``maybe_seen_flag``."""
        probe = self._probe_positions
        orig_cols = [f.name for f in df.schema.fields]
        out_schema = T.StructType(list(df.schema.fields) +
                                  [T.StructField(flag, T.BooleanType())])
        bloom_df = spark.createDataFrame(
            [(p, self.bits[p].tobytes()) for p in range(self.P)],
            schema=T.StructType([T.StructField("pid", T.IntegerType()),
                                 T.StructField("bitset", T.BinaryType())]))
        hashed = self._with_hashes(df, col)

        def probe_group(cand: pd.DataFrame, bits_pdf: pd.DataFrame) -> pd.DataFrame:
            out = cand[orig_cols].copy()
            if not len(cand):
                out[flag] = pd.Series([], dtype=bool)
                return out
            if not len(bits_pdf):
                out[flag] = False
                return out
            bits = np.frombuffer(bits_pdf["bitset"].iloc[0], dtype=np.uint8)
            pos = probe(cand["_h1"].to_numpy(), cand["_h2"].to_numpy())
            byte = bits[pos >> 3]
            hit = (byte & (1 << (pos & 7)).astype(np.uint8)) != 0
            out[flag] = hit.all(axis=1)
            return out

        return (hashed.groupBy("_pid").cogroup(bloom_df.groupBy("pid"))
                .applyInPandas(probe_group, schema=out_schema))

    def prefilter(self, spark: SparkSession, candidates: DataFrame,
                  col: str, seen: DataFrame,
                  method: str = "broadcast",
                  verify: str = "shuffle") -> DataFrame:
        """Exact dedup with Bloom short-circuit: returns candidates NOT in
        ``seen`` — identical result to a plain left_anti join (no false
        negatives), but only Bloom-positive rows reach the verify join.
        ``method="cogroup"`` probes via the co-partitioned bitset table
        (scale path, no full-matrix broadcast).

        ``verify`` picks the exact-verify join strategy:
        - "shuffle" (default): plain left_anti — right when suspects are a
          large fraction of the candidates (bulk corpus dedup);
        - "broadcast": suspects broadcast into a streaming left_semi scan
          of seen, hits broadcast back — the seen table is read once,
          column-pruned, never exchanged. Right when suspects are bounded
          (the crawl cycle's politeness-budget links) and seen is huge."""
        if method == "cogroup":
            flagged = self.maybe_seen_flag_cogrouped(
                spark, candidates, col).persist()
        else:
            flagged = self.maybe_seen_flag(spark, candidates, col).persist()
        definite_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        suspects = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
        if verify == "broadcast":
            hits = seen.join(F.broadcast(suspects.select(col)), col, "left_semi")
            verified_new = suspects.join(F.broadcast(hits), col, "left_anti")
        else:
            verified_new = suspects.join(seen, col, "left_anti")
        return definite_new.unionByName(verified_new)

    # -- persistence ----------------------------------------------------------
    def to_pandas(self) -> pd.DataFrame:
        return pd.DataFrame({
            "pid": np.arange(self.P, dtype=np.int32),
            "bitset": [self.bits[p].tobytes() for p in range(self.P)],
            "m": np.full(self.P, self.m, dtype=np.int64),
            "k": np.full(self.P, self.k, dtype=np.int64),
            "n_added": np.full(self.P, self.n_added, dtype=np.int64),
        })

    @classmethod
    def from_pandas(cls, pdf: pd.DataFrame) -> "PartitionedBloom":
        P = len(pdf)
        m = int(pdf["m"].iloc[0])
        obj = cls.__new__(cls)
        obj.P, obj.m = P, m
        obj.k = int(pdf["k"].iloc[0])
        obj.n_added = int(pdf["n_added"].iloc[0])
        obj.bits = np.zeros((P, m // 8), dtype=np.uint8)
        obj._bc = None
        for _, r in pdf.iterrows():
            obj.bits[int(r["pid"])] = np.frombuffer(r["bitset"], dtype=np.uint8)
        return obj

    def to_df(self, spark: SparkSession) -> "DataFrame":
        return spark.createDataFrame(
            [(p, self.bits[p].tobytes(), self.m, self.k, self.n_added)
             for p in range(self.P)],
            schema=BLOOM_SCHEMA)

    @classmethod
    def from_df(cls, df: DataFrame) -> "PartitionedBloom":
        rows = df.collect()
        pdf = pd.DataFrame({
            "pid": [r["pid"] for r in rows],
            "bitset": [bytes(r["bitset"]) for r in rows],
            "m": [r["m"] for r in rows],
            "k": [r["k"] for r in rows],
            "n_added": [r["n_added"] for r in rows],
        })
        return cls.from_pandas(pdf)

    def fp_rate_estimate(self) -> float:
        """Expected false-positive rate from current fill factor."""
        fill = float(np.unpackbits(self.bits).mean())
        return fill ** self.k


class CuckooFilter:
    """Single-node cuckoo filter (deletable seen-set variant): 4-slot
    buckets, 16-bit fingerprints, 2 candidate buckets via partial-key
    cuckoo hashing. Deletions let recrawl-expired URLs leave the seen set
    (the Bloom filter cannot delete). Numpy storage; per-partition instances
    compose the same way as PartitionedBloom."""

    def __init__(self, capacity: int = 1 << 16):
        self.n_buckets = max(8, 1 << (capacity.bit_length()))
        self.slots = np.zeros((self.n_buckets, 4), dtype=np.uint16)
        self.max_kicks = 500

    @staticmethod
    def _fingerprint(h: int) -> int:
        fp = (h >> 32) & 0xFFFF
        return fp if fp != 0 else 1

    def _buckets(self, h: int) -> tuple[int, int]:
        fp = self._fingerprint(h)
        i1 = h % self.n_buckets
        i2 = (i1 ^ (fp * 0x5BD1E995)) % self.n_buckets
        return i1, i2

    def add(self, h: int) -> bool:
        import random
        fp = self._fingerprint(h)
        i1, i2 = self._buckets(h)
        for i in (i1, i2):
            row = self.slots[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        rng = random.Random(h & 0xFFFFFFFF)
        i = rng.choice((i1, i2))
        for _ in range(self.max_kicks):
            slot = rng.randrange(4)
            fp, self.slots[i][slot] = int(self.slots[i][slot]), fp
            i = (i ^ (fp * 0x5BD1E995)) % self.n_buckets
            row = self.slots[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False  # table full

    def contains(self, h: int) -> bool:
        fp = self._fingerprint(h)
        i1, i2 = self._buckets(h)
        return bool((self.slots[i1] == fp).any() or (self.slots[i2] == fp).any())

    def delete(self, h: int) -> bool:
        fp = self._fingerprint(h)
        for i in self._buckets(h):
            idx = np.where(self.slots[i] == fp)[0]
            if len(idx):
                self.slots[i][idx[0]] = 0
                return True
        return False

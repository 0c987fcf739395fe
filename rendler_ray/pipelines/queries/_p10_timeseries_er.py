

def kmv_overlap_types(sf_dir: str, k: int = 64):
    """KMV sketch SET ALGEBRA (Beyer et al., SIGMOD'07 §4): per
    event-type-PAIR union / intersection / Jaccard estimates from the
    per-type KMV sketches alone — the mergeable-sketch query a
    lakehouse answers without rescanning ("how many users do
    'click' and 'purchase' share?"). From the union sketch's k-th
    order statistic K: D̂_∪ = (k−1)·2⁶⁰/K; Ĵ = n_both/n_kept where
    n_both counts union-sketch members present in BOTH input
    sketches; D̂_∩ = n_both·D̂_∪/n_kept. Everything is a deterministic
    function of the 60-bit md5 hashes, so the oracle is cell-exact
    (the kmv_distinct_users philosophy; sub-k pairs degrade to exact
    counts by the same formulas).

    Scale shape: ONE corpus pass builds all per-type sketches
    (kmv_distinct_users' per-batch prune — ≤ k·types rows leave any
    batch); the pairwise algebra folds ≤ k·types driver rows into
    types·(types−1)/2 output rows. The corpus is never rescanned per
    pair."""
    import hashlib

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def prune(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "u": t["user_id"].to_numpy(zero_copy_only=False)}) \
            .drop_duplicates()
        hmap = {int(u): int(hashlib.md5(str(int(u)).encode())
                            .hexdigest()[:15], 16)
                for u in df["u"].unique().tolist()}
        df["h"] = df["u"].map(hmap).astype(np.int64)
        df = df.sort_values("h", kind="stable") \
               .groupby("event_type", sort=False).head(k)
        return pa.Table.from_pandas(df[["event_type", "h"]],
                                    preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        hs = np.unique(g["h"].to_numpy(np.int64))[:k]
        return pd.DataFrame({"event_type": g["event_type"].iloc[0],
                             "h": hs})

    rows = (ds.map_batches(prune, batch_format="pyarrow")
            .groupby("event_type").map_groups(merge,
                                              batch_format="pandas")
            .take_all())  # bounded: <= k rows per event type
    sk: dict[str, list] = {}
    for r in rows:
        sk.setdefault(r["event_type"], []).append(int(r["h"]))
    types = sorted(sk)
    out = {c: [] for c in ("type_a", "type_b", "n_kept", "n_both",
                           "union_est", "jaccard_e6", "inter_est")}
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            sa, sb = set(sk[ta]), set(sk[tb])
            union = sorted(sa | sb)[:k]
            n_kept, kth = len(union), union[-1]
            u_est = n_kept if n_kept < k else (k - 1) * (16 ** 15) // kth
            n_both = sum(1 for h in union if h in sa and h in sb)
            out["type_a"].append(ta)
            out["type_b"].append(tb)
            out["n_kept"].append(n_kept)
            out["n_both"].append(n_both)
            out["union_est"].append(u_est)
            out["jaccard_e6"].append(n_both * 10 ** 6 // n_kept)
            out["inter_est"].append(n_both * u_est // n_kept)
    return pa.table({c: pa.array(v, pa.string() if c[0] == "t"
                                 else pa.int64())
                     for c, v in out.items()})


KMV_OVERLAP_SQL = """
WITH h AS (SELECT DISTINCT event_type,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
           FROM events),
r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h)
               AS rk
      FROM h),
s AS (SELECT event_type, h FROM r WHERE rk <= 64),
t AS (SELECT DISTINCT event_type FROM events),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM t a JOIN t b ON a.event_type < b.event_type),
un AS (SELECT p.type_a, p.type_b, s.h
       FROM p JOIN s ON s.event_type IN (p.type_a, p.type_b)
       GROUP BY p.type_a, p.type_b, s.h),
ur AS (SELECT type_a, type_b, h,
              row_number() OVER (PARTITION BY type_a, type_b
                                 ORDER BY h) AS rk
       FROM un),
uk AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_kept,
              CAST(max(h) AS BIGINT) AS kth
       FROM ur WHERE rk <= 64 GROUP BY type_a, type_b),
bo AS (SELECT uk.type_a, uk.type_b, CAST(count(*) AS BIGINT) AS n_both
       FROM uk
       JOIN s sa ON sa.event_type = uk.type_a AND sa.h <= uk.kth
       JOIN s sb ON sb.event_type = uk.type_b AND sb.h = sa.h
       GROUP BY uk.type_a, uk.type_b),
est AS (SELECT uk.type_a, uk.type_b, uk.n_kept,
               CAST(coalesce(bo.n_both, 0) AS BIGINT) AS n_both,
               CAST(CASE WHEN uk.n_kept < 64 THEN uk.n_kept
                    ELSE CAST(63 AS HUGEINT) * 1152921504606846976
                         // uk.kth END AS BIGINT) AS union_est
        FROM uk LEFT JOIN bo
          ON bo.type_a = uk.type_a AND bo.type_b = uk.type_b)
SELECT type_a, type_b, n_kept, n_both, union_est,
       CAST(n_both * 1000000 // n_kept AS BIGINT) AS jaccard_e6,
       CAST(CAST(n_both AS HUGEINT) * union_est // n_kept AS BIGINT)
         AS inter_est
FROM est
"""


def isotonic_calibrate_scores(sf_dir: str):
    """ISOTONIC REGRESSION calibration of the quality classifier by
    POOL-ADJACENT-VIOLATORS (Ayer et al. 1955; the calibrator behind
    sklearn's ``CalibratedClassifierCV(method='isotonic')``) against
    the lang = 'en' label — the monotone score → probability map the
    reliability-diagram op (:func:`calibration_curve_docs`) motivates.
    Output per distinct score: its pooled block's calibrated
    probability as an EXACT reduced rational (iso_num / iso_den) —
    PAV pooling is pure integer arithmetic, so the result is
    golden-pinned (the sequential pooling fixpoint has no SQL form).

    Scale shape: auc_quality_eval's machinery — shuffle-free scoring
    pass, per-batch (score, label) combine, one bounded groupby; PAV
    itself runs over the O(score-range) driver histogram with a
    stack (each block merges at most once per push — linear)."""
    from fractions import Fraction

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        w = _clf_weights(uniq)[inv]
        s = np.rint(np.bincount(par, weights=w, minlength=t.num_rows)) \
            .astype(np.int64)
        pos = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"s": s, "p": pos.astype(np.int64)}) \
            .groupby("s", sort=False).agg(np_=("p", "sum"),
                                          n_=("p", "size"))
        return pa.table({
            "s": pa.array(g.index.to_numpy(np.int64), pa.int64()),
            "np_": pa.array(g["np_"].to_numpy(np.int64), pa.int64()),
            "n_": pa.array(g["n_"].to_numpy(np.int64), pa.int64())})

    rows = (ds.map_batches(score, batch_format="pyarrow")
            .groupby("s").aggregate(Sum("np_", alias_name="np_"),
                                    Sum("n_", alias_name="n_"))
            .take_all())  # bounded by the score RANGE
    rows.sort(key=lambda r: r["s"])
    # PAV stack: blocks (n_pos, n, first_index); merge while the
    # previous block's rate exceeds the new one's (weighted mean)
    stack: list[list[int]] = []
    for r in rows:
        blk = [int(r["np_"]), int(r["n_"])]
        while stack and stack[-1][0] * blk[1] > blk[0] * stack[-1][1]:
            prev = stack.pop()
            blk = [prev[0] + blk[0], prev[1] + blk[1]]
        stack.append(blk)
    import math

    s_col, n_col, np_col, inum, iden = [], [], [], [], []
    it = iter(rows)
    for blk in stack:
        left = blk[1]
        g = math.gcd(blk[0], blk[1])
        while left > 0:
            r = next(it)
            s_col.append(int(r["s"]))
            n_col.append(int(r["n_"]))
            np_col.append(int(r["np_"]))
            inum.append(blk[0] // g)
            iden.append(blk[1] // g)
            left -= int(r["n_"])
    return pa.table({"s": pa.array(s_col, pa.int64()),
                     "n": pa.array(n_col, pa.int64()),
                     "n_pos": pa.array(np_col, pa.int64()),
                     "iso_num": pa.array(inum, pa.int64()),
                     "iso_den": pa.array(iden, pa.int64())})


def anova_order_priority(sf_dir: str):
    """ONE-WAY ANOVA F-test of order value across the five order
    priorities — the k-arm generalization of :func:`welch_t_ab_test`
    (is ANY priority's mean spend different?). EXACT integer end to
    end, no float convention at all: with per-group moments
    (n_g, s_g = Σcents) and the global square sum Q = Σcents², the
    e6-scaled sums of squares a_e6 = Σ_g s_g²·10⁶ // n_g and
    b_e6 = S²·10⁶ // n give ssb_e6 = max(a_e6 − b_e6, 0) (the floor
    residue can dip −k below the Cauchy–Schwarz zero, clamped BOTH
    sides), ssw_e6 = Q·10⁶ − a_e6, and
    F_e6 = ssb_e6·(n−k)·10⁶ // (ssw_e6·(k−1)) — every division a
    floor of non-negative integers (Python int / HUGEINT), so the
    oracle is hash-exact (the gini_simpson property; Welch's t needed
    a float tree, the F ratio doesn't).

    Scale shape: one shuffle-free per-batch priority-moment combine +
    a ≤ k groupby. Per-row cents² reaches 2⁵², so batch-partial Q
    sums would overflow int64 — partials carry q decomposed as
    (q >> 31, q & (2³¹−1)) int64 pairs and the driver reassembles the
    exact Python int (the overflow-safe split the HUGEINT side gets
    for free)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def moments(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        pr = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        qq = cents * cents  # < 2^52 per row
        df = pd.DataFrame({"p": pr, "n": 1, "s": cents,
                           "q_hi": qq >> 31,
                           "q_lo": qq & ((1 << 31) - 1)})
        g = df.groupby("p", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = (ds.map_batches(moments, batch_format="pyarrow")
            .groupby("p")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s", alias_name="s"),
                       Sum("q_hi", alias_name="q_hi"),
                       Sum("q_lo", alias_name="q_lo"))
            .take_all())  # one row per priority
    k = len(rows)
    n = sum(int(r["n"]) for r in rows)
    s_tot = sum(int(r["s"]) for r in rows)
    q_tot = sum((int(r["q_hi"]) << 31) + int(r["q_lo"]) for r in rows)
    a_e6 = sum(int(r["s"]) * int(r["s"]) * 1_000_000 // int(r["n"])
               for r in rows)
    ssb_e6 = max(a_e6 - s_tot * s_tot * 1_000_000 // n, 0)
    ssw_e6 = q_tot * 1_000_000 - a_e6
    eta2_e6 = (ssb_e6 * 1_000_000 // (ssb_e6 + ssw_e6)
               if ssb_e6 + ssw_e6 > 0 else 0)
    f_e6 = (ssb_e6 * (n - k) * 1_000_000 // (ssw_e6 * (k - 1))
            if ssw_e6 > 0 and k > 1 else 0)
    return pa.table({"k_groups": pa.array([k], pa.int64()),
                     "n": pa.array([n], pa.int64()),
                     "sum_c": pa.array([s_tot], pa.int64()),
                     "eta2_e6": pa.array([eta2_e6], pa.int64()),
                     "f_e6": pa.array([f_e6], pa.int64())})


ANOVA_PRIORITY_SQL = """
WITH m AS (
  SELECT o_orderpriority,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS HUGEINT) AS s,
         CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT)
                  * CAST(round(o_totalprice * 100) AS HUGEINT))
              AS HUGEINT) AS q
  FROM orders GROUP BY o_orderpriority),
g AS (SELECT CAST(count(*) AS HUGEINT) AS k, sum(n) AS n, sum(s) AS s,
             sum(q) AS q, sum(s * s * 1000000 // n) AS a_e6
      FROM m),
f AS (SELECT k, n, s,
             greatest(a_e6 - s * s * 1000000 // n,
                      CAST(0 AS HUGEINT)) AS ssb_e6,
             q * 1000000 - a_e6 AS ssw_e6
      FROM g)
SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n,
       CAST(s AS BIGINT) AS sum_c,
       CASE WHEN ssb_e6 + ssw_e6 > 0
            THEN CAST(ssb_e6 * 1000000 // (ssb_e6 + ssw_e6) AS BIGINT)
            ELSE 0 END AS eta2_e6,
       CASE WHEN ssw_e6 > 0 AND k > 1
            THEN CAST(ssb_e6 * (n - k) * 1000000
                      // (ssw_e6 * (k - 1)) AS BIGINT)
            ELSE 0 END AS f_e6
FROM f
"""


def mann_kendall_daily(sf_dir: str):
    """MANN–KENDALL trend test on daily event volume — the
    non-parametric "is traffic drifting?" monitor that pairs with
    :func:`theil_sen_daily_trend` (MK tests the sign, Theil–Sen sizes
    the slope — the classic combination). S = Σ_{i<j} sign(c_j − c_i)
    and the tie-corrected 18·Var = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)
    are exact integers; the normal-approximation z (continuity-
    corrected: (S∓1)/√(Var)) is the only float, computed from those
    integers with the expression tree mirrored verbatim in SQL then
    floor·10⁶ (the welch_t convention).

    Scale shape: the autocorr_daily_counts fold — per-batch day-count
    combine + one bounded groupby (a decade is 3653 rows); the O(D²)
    pair sum runs on the bounded daily table (numpy here, a self-join
    in SQL), never on events."""
    import math

    ds = _read(sf_dir, "events", ["ts"])

    def days(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = us // 86_400_000_000
        ud, cnt = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(ud, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    daily = (ds.map_batches(days, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="c")))
    rows = []
    for bt in daily.iter_batches(batch_size=None,
                                 batch_format="pyarrow"):
        rows.extend(zip(bt["day"].to_pylist(), bt["c"].to_pylist()))
    rows.sort()
    c = np.array([v for _, v in rows], np.int64)
    n = len(c)
    # S = Σ_{i<j} sign(c_j − c_i) in O(n log n) via a Fenwick-tree
    # inversion count over compressed value ranks (no n×n pair
    # matrix — a decade of daily rows would transiently cost 100 MB):
    # with T = C(n,2), tie_pairs = Σ_t C(t,2) and I = #{i<j: c_j<c_i},
    # S = (T − tie_pairs) − 2I.
    uniq, tcnt = np.unique(c, return_counts=True)
    if n > 1:
        ranks = np.searchsorted(uniq, c)  # 0-based compressed rank
        tree = np.zeros(len(uniq) + 1, np.int64)
        inv = 0
        for done, r in enumerate(ranks):
            i = int(r) + 1
            le = 0  # earlier elements with rank ≤ r
            while i > 0:
                le += int(tree[i])
                i -= i & (-i)
            inv += done - le  # earlier strictly greater
            i = int(r) + 1
            while i < len(tree):
                tree[i] += 1
                i += i & (-i)
        tie_pairs = int((tcnt.astype(object) * (tcnt - 1) // 2).sum())
        s_stat = n * (n - 1) // 2 - tie_pairs - 2 * inv
    else:
        s_stat = 0
    ties = sum(int(t) * (int(t) - 1) * (2 * int(t) + 5) for t in tcnt)
    var18 = n * (n - 1) * (2 * n + 5) - ties
    if var18 <= 0 or s_stat == 0:
        z_e6 = 0
    else:
        sd = math.sqrt(var18 / 18.0)
        z = (s_stat - 1) / sd if s_stat > 0 else (s_stat + 1) / sd
        z_e6 = math.floor(z * 1_000_000.0)
    return pa.table({"n_days": pa.array([n], pa.int64()),
                     "s_stat": pa.array([s_stat], pa.int64()),
                     "var18": pa.array([var18], pa.int64()),
                     "z_e6": pa.array([z_e6], pa.int64())})


MANN_KENDALL_SQL = """
WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
p AS (SELECT CAST(COALESCE(sum(CASE WHEN b.c > a.c THEN 1
                                    WHEN b.c < a.c THEN -1
                                    ELSE 0 END), 0) AS BIGINT) AS s
      FROM d a JOIN d b ON b.day > a.day),
t AS (SELECT CAST(COALESCE(sum(t_ * (t_ - 1) * (2 * t_ + 5)), 0)
                  AS BIGINT) AS tie
      FROM (SELECT CAST(count(*) AS BIGINT) AS t_ FROM d GROUP BY c)),
n_ AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
v AS (SELECT n_.n AS n, p.s AS s,
             n_.n * (n_.n - 1) * (2 * n_.n + 5) - t.tie AS var18
      FROM p, t, n_)
SELECT n AS n_days, s AS s_stat, var18,
       CASE WHEN var18 <= 0 OR s = 0 THEN 0
            WHEN s > 0 THEN CAST(floor(
              (s - 1) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
              * 1000000.0) AS BIGINT)
            ELSE CAST(floor(
              (s + 1) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
              * 1000000.0) AS BIGINT) END AS z_e6
FROM v
"""


def interarrival_burstiness_users(sf_dir: str):
    """Per-user INTER-ARRIVAL BURSTINESS (squared coefficient of
    variation of the gaps between a user's consecutive events) — the
    Goh–Barabási bursty-vs-Poisson diagnostic bot-detection and
    capacity models run per entity (CV² ≈ 1 = Poisson, ≪ 1 = metronome
    bot, ≫ 1 = bursty human). Sqrt-free and EXACT: with per-user gap
    moments (m gaps, G = Σg, Q = Σg²) over whole-second gaps,
    cv2_e6 = (m·Q − G²)·10⁶ // G² — a non-negative integer rational
    (Cauchy–Schwarz), Python-int / HUGEINT. Users need ≥ 2 gaps and
    G > 0 to be emitted (a variance and a mean to divide by).

    Scale shape: the dedup_events_window co-partition — one
    ``groupby(user_id)`` hash exchange, per-group vectorized sort +
    diff, one output row per group; no driver state, no window
    shuffle beyond the key exchange."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    _empty = {"user_id": np.array([], np.int64),
              "n_gaps": np.array([], np.int64),
              "sum_gap_s": np.array([], np.int64),
              "cv2_e6": np.array([], np.int64)}

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        sec = (g["ts"].to_numpy("datetime64[us]").astype(np.int64)
               // 1_000_000)
        gaps = np.diff(sec)  # ordered by ts ⇒ every gap ≥ 0
        m = len(gaps)
        if m < 2:
            return pd.DataFrame(_empty)
        sg = int(gaps.sum())
        if sg == 0:
            return pd.DataFrame(_empty)
        sq = int((gaps * gaps).sum())  # gaps < 2^26 s ⇒ int64-safe
        cv2 = (m * sq - sg * sg) * 1_000_000 // (sg * sg)
        return pd.DataFrame({
            "user_id": np.array([g["user_id"].iloc[0]], np.int64),
            "n_gaps": np.array([m], np.int64),
            "sum_gap_s": np.array([sg], np.int64),
            "cv2_e6": np.array([cv2], np.int64)})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


INTERARRIVAL_SQL = """
WITH e AS (SELECT user_id, event_id, ts,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
g AS (SELECT user_id,
             sec - lag(sec) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS gap
      FROM e),
s AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS m,
             CAST(sum(gap) AS HUGEINT) AS sg,
             CAST(sum(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS sq
      FROM g WHERE gap IS NOT NULL GROUP BY user_id)
SELECT user_id, CAST(m AS BIGINT) AS n_gaps,
       CAST(sg AS BIGINT) AS sum_gap_s,
       CAST((m * sq - sg * sg) * 1000000 // (sg * sg) AS BIGINT)
         AS cv2_e6
FROM s WHERE m >= 2 AND sg > 0
"""


def zipf_fit_tokens(sf_dir: str, k: int = 200):
    """ZIPF-LAW FIT over the top-k token frequencies — the
    corpus-health number every dataset card quotes (natural text sits
    near slope −1; boilerplate-heavy crawls flatten, template spam
    steepens): OLS slope of ln(freq) on ln(rank) for the top-200
    tokens. Each (x, y) = (ln rank, ln count) point is e6
    fixed-pointed FIRST (DuckDB round() half-away mirror), so the
    normal-equation sums Σx, Σy, Σxy, Σx² are exact integers and the
    slope is the exact rational (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) —
    reported as num/den plus the floor-e6 quotient (explicit
    floor-division CASE in SQL, the theil_sen convention, since the
    Zipf slope is negative and DuckDB ``//`` truncates toward zero).
    Rank ties share a count, so the fitted point set is deterministic
    without a tie-break.

    Scale shape: the shared :func:`_token_freq_topk_counts` vocabulary
    cut — per-batch value-counts partials, driver Arrow fold under the
    2M-row gate, distributed groupby + sort + limit above it; the
    regression itself runs on ≤ 200 points."""
    ds = _read(sf_dir, "documents", ["text"])
    pairs = _token_freq_topk_counts(ds, k)
    n = len(pairs)
    if n == 0:
        return pa.table({"n_ranks": pa.array([], pa.int64()),
                         "slope_num": pa.array([], pa.int64()),
                         "slope_den": pa.array([], pa.int64()),
                         "slope_e6": pa.array([], pa.int64())})
    c = np.array([p[1] for p in pairs], np.float64)
    x = _round_half_away(
        np.log(np.arange(1, n + 1, dtype=np.float64)) * 1e6)
    y = _round_half_away(np.log(c) * 1e6)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope_e6 = (num * 1_000_000) // den if den > 0 else 0
    return pa.table({"n_ranks": pa.array([n], pa.int64()),
                     "slope_num": pa.array([num], pa.int64()),
                     "slope_den": pa.array([den], pa.int64()),
                     "slope_e6": pa.array([slope_e6], pa.int64())})


ZIPF_FIT_SQL = """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
             FROM documents),
f AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok
      GROUP BY token),
r AS (SELECT c, row_number() OVER (ORDER BY c DESC, token ASC) AS rnk
      FROM f QUALIFY rnk <= 200),
v AS (SELECT CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000000)
                  AS HUGEINT) AS x,
             CAST(round(ln(CAST(c AS DOUBLE)) * 1000000)
                  AS HUGEINT) AS y
      FROM r),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
             sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM v),
o AS (SELECT n, n * sxy - sx * sy AS num,
             n * sxx - sx * sx AS den FROM s)
SELECT CAST(n AS BIGINT) AS n_ranks, CAST(num AS BIGINT) AS slope_num,
       CAST(den AS BIGINT) AS slope_den,
       CASE WHEN den <= 0 THEN 0
            WHEN num >= 0 THEN CAST(num * 1000000 // den AS BIGINT)
            ELSE CAST(-(((-num) * 1000000 + den - 1) // den) AS BIGINT)
       END AS slope_e6
FROM o
"""


def bridges_crawl_graph(sf_dir: str, driver_max: int = 2_000_000):
    """BRIDGE EDGES of the orders-derived test graph (Tarjan 1974) —
    the single-point-of-failure edges whose removal disconnects a
    component: the link-infrastructure audit a crawl-graph owner runs
    before pruning low-value edges (every bridge is in NO cycle, so
    near-forest regions are almost all bridges). One iterative
    low-link DFS in :func:`rendler_ray.functions.graph.
    bridges_articulation`; the output is the SET of bridges —
    DFS-order independent by construction.

    Scale shape: below the edge gate, a driver fold of the distinct
    edge list (the betweenness/diameter convention); above it,
    PER-COMPONENT SHARDING (:func:`_percomp_bridges_cuts`) —
    components are independent for cut structure, so one Tarjan task
    runs per component. Two-form equality pytest-asserted (forced
    past the gate)."""
    from rendler_ray.functions.graph import bridges_articulation

    edges = _orders_graph_edges(sf_dir).materialize()
    n = edges.count()
    if n > driver_max:
        return _percomp_bridges_cuts(edges, emit="bridges")
    t = pa.concat_tables(
        edges.iter_batches(batch_size=None, batch_format="pyarrow"))
    br, _ = bridges_articulation(t["a"].to_numpy(), t["b"].to_numpy())
    return pa.table({"a": pa.array([e[0] for e in br], pa.int64()),
                     "b": pa.array([e[1] for e in br], pa.int64())})


def articulation_points_graph(sf_dir: str, driver_max: int = 2_000_000):
    """ARTICULATION POINTS (cut vertices) of the orders-derived test
    graph — the nodes whose removal disconnects a component, the
    vertex-side companion of :func:`bridges_crawl_graph` (same Tarjan
    low-link pass, same driver gate, same per-component distributed
    form past it — two-form equality pytest-asserted)."""
    from rendler_ray.functions.graph import bridges_articulation

    edges = _orders_graph_edges(sf_dir).materialize()
    n = edges.count()
    if n > driver_max:
        return _percomp_bridges_cuts(edges, emit="cuts")
    t = pa.concat_tables(
        edges.iter_batches(batch_size=None, batch_format="pyarrow"))
    _, cuts = bridges_articulation(t["a"].to_numpy(), t["b"].to_numpy())
    return pa.table({"node": pa.array(cuts, pa.int64())})


def _percomp_bridges_cuts(edges, emit: str):
    """Distributed per-component Tarjan low-link: component labels
    from :func:`connected_components_auto` over zero-padded string
    ids (vectorized lpad/cast — lexicographic order equals numeric),
    labels joined onto edges by endpoint ``a`` (both endpoints share
    the label by definition), then ONE iterative DFS task per
    component via ``groupby(component).map_groups`` — components
    partition cut structure exactly (no bridge or articulation point
    spans components). A giant component still lands in one task;
    that is the documented bound of the per-component scale path."""
    from rendler_ray.functions import graph as F_graph
    from rendler_ray.state.politeness import _nonempty_blocks

    labels = F_graph.connected_components_auto(
        edges.map_batches(
            lambda t: pa.table({
                "src": pc.utf8_lpad(pc.cast(t["a"], pa.string()),
                                    12, padding="0"),
                "dst": pc.utf8_lpad(pc.cast(t["b"], pa.string()),
                                    12, padding="0")}),
            batch_format="pyarrow"))
    lab = labels.map_batches(
        lambda t: pa.table({"a": pc.cast(t["url"], pa.int64()),
                            "comp": t["component"]}),
        batch_format="pyarrow").materialize()
    joined = edges.join(lab, join_type="inner", num_partitions=8,
                        on=("a",)).materialize()

    def per_comp(g: pd.DataFrame) -> pd.DataFrame:
        br, cuts = F_graph.bridges_articulation(
            g["a"].to_numpy(np.int64), g["b"].to_numpy(np.int64))
        if emit == "bridges":
            return pd.DataFrame(
                {"a": pd.Series([e[0] for e in br], dtype=np.int64),
                 "b": pd.Series([e[1] for e in br], dtype=np.int64)})
        return pd.DataFrame({"node": pd.Series(cuts, dtype=np.int64)})

    out = _nonempty_blocks(
        joined.groupby("comp").map_groups(
            per_comp, batch_format="pandas").materialize())
    if out is None:
        if emit == "bridges":
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"node": pa.array([], pa.int64())})
    return out


def holt_linear_daily(sf_dir: str):
    """HOLT'S LINEAR-TREND double exponential smoothing of daily event
    volume (Holt 1957) — the level+trend upgrade of
    :func:`ewma_daily_counts` that a capacity forecast actually uses
    (EWMA lags a drifting series; Holt tracks the drift). α = β = 1/2:
    l_t = (y_t + l_{t−1} + b_{t−1}) / 2, b_t = (l_t − l_{t−1} +
    b_{t−1}) / 2, initialized l_1 = y_1, b_1 = 0. The DuckDB oracle
    replays the IDENTICAL recurrence through a recursive CTE in the
    same day order — a sequential TWO-variable recurrence this time —
    so the doubles agree bit-for-bit and floor(·1e6) is hash-exact
    (the ewma convention).

    Scale shape: one shuffle-free per-batch (day, n) combine + a
    calendar-bounded groupby; the inherently-sequential smoothing runs
    over the ≤ #days driver rows."""
    import math

    ds = _read(sf_dir, "events", ["ts"])

    def days(t: pa.Table) -> pa.Table:
        d = (t["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64)) // 86_400_000_000
        u, c = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    daily = (ds.map_batches(days, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="n")))
    rows = sorted((int(r["day"]), int(r["n"])) for r in daily.take_all())
    rn, day, n, lv, tr = [], [], [], [], []
    l = b = 0.0
    for i, (d, cnt) in enumerate(rows):
        if i == 0:
            l, b = float(cnt), 0.0
        else:
            l_new = (cnt + l + b) / 2.0
            b = (l_new - l + b) / 2.0
            l = l_new
        rn.append(i + 1)
        day.append(d)
        n.append(cnt)
        lv.append(math.floor(l * 1000000.0))
        tr.append(math.floor(b * 1000000.0))
    return pa.table({"rn": pa.array(rn, pa.int64()),
                     "day": pa.array(day, pa.int64()),
                     "n": pa.array(n, pa.int64()),
                     "level_e6": pa.array(lv, pa.int64()),
                     "trend_e6": pa.array(tr, pa.int64())})


HOLT_LINEAR_SQL = """
WITH RECURSIVE d AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day),
o AS (SELECT day, n, row_number() OVER (ORDER BY day) AS rn FROM d),
w(rn, day, n, l, b) AS (
  -- the anchor's trend must be CAST: a bare 0.0 literal would type
  -- the recursive column DECIMAL(2,1) and quantize every step
  SELECT rn, day, n, CAST(n AS DOUBLE), CAST(0.0 AS DOUBLE)
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.rn, o.day, o.n,
         (o.n + w.l + w.b) / 2.0,
         ((o.n + w.l + w.b) / 2.0 - w.l + w.b) / 2.0
  FROM w JOIN o ON o.rn = w.rn + 1)
SELECT CAST(rn AS BIGINT) AS rn, CAST(day AS BIGINT) AS day, n,
       CAST(floor(l * 1000000.0) AS BIGINT) AS level_e6,
       CAST(floor(b * 1000000.0) AS BIGINT) AS trend_e6
FROM w
"""


def seasonal_naive_eval(sf_dir: str):
    """SEASONAL-NAIVE forecast evaluation on daily event volume — the
    baseline every traffic forecast must beat (ŷ_d = y_{d−7}, the
    same-weekday-last-week rule), scored on the days where the
    calendar lag exists. EXACT integers end to end: per-day absolute
    error |y_d − y_{d−7}| and per-day APE term |err|·10⁶ // y_d are
    integer-floored BEFORE their sums (the token-entropy convention,
    trivially exact here since everything is a count), so the one-row
    report (n_eval_days, Σ|err|, MAE e6, Σ APE e6) is hash-exact.

    Scale shape: the bounded daily fold + an O(#days) driver pass
    (calendar join in SQL); nothing beyond day-count partials ever
    shuffles."""
    ds = _read(sf_dir, "events", ["ts"])

    def days(t: pa.Table) -> pa.Table:
        d = (t["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64)) // 86_400_000_000
        u, c = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    daily = (ds.map_batches(days, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="n")))
    cnt = {int(r["day"]): int(r["n"]) for r in daily.take_all()}
    n_eval = sum_abs = sum_ape = 0
    for d, y in sorted(cnt.items()):
        prev = cnt.get(d - 7)
        if prev is None:
            continue
        err = abs(y - prev)
        n_eval += 1
        sum_abs += err
        sum_ape += err * 1_000_000 // y
    mae_e6 = sum_abs * 1_000_000 // n_eval if n_eval else 0
    return pa.table({
        "n_eval_days": pa.array([n_eval], pa.int64()),
        "sum_abs_err": pa.array([sum_abs], pa.int64()),
        "mae_e6": pa.array([mae_e6], pa.int64()),
        "sum_ape_e6": pa.array([sum_ape], pa.int64())})


SEASONAL_NAIVE_SQL = """
WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY day),
e AS (SELECT a.day, a.n, abs(a.n - b.n) AS err
      FROM d a JOIN d b ON b.day = a.day - 7),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_eval,
             CAST(COALESCE(sum(err), 0) AS BIGINT) AS sum_abs,
             CAST(COALESCE(sum(err * 1000000 // n), 0) AS BIGINT)
               AS sum_ape
      FROM e)
SELECT n_eval AS n_eval_days, sum_abs AS sum_abs_err,
       CASE WHEN n_eval > 0
            THEN CAST(sum_abs * 1000000 // n_eval AS BIGINT)
            ELSE 0 END AS mae_e6,
       sum_ape AS sum_ape_e6
FROM s
"""


def logreg_quality_fit(sf_dir: str, steps: int = 3):
    """LOGISTIC-REGRESSION training ON-CLUSTER — full-batch gradient
    descent for the lang = 'en' label on features (1, n_chars/1000),
    the from-scratch counterpart of the fitted NB classifier
    (:func:`nb_lang_fit_predict`): 3 steps, η = 1/4, w kept as e6
    INTEGERS between steps. Each step is one shuffle-free pass: the
    per-row gradient addends (p − y)·10⁶ and (p − y)·x·10⁶ are
    half-away-rounded to ints BEFORE the sum (order-free — the
    token-entropy convention), the sigmoid's float tree
    p = 1/(1+exp(−(w0 + w1·x)/10⁶)) is mirrored VERBATIM in SQL from
    the same integer weights, and the update w ← w − ⌊g/(4n)⌋ is an
    explicit floor division (CASE-mirrored for negative gradients, the
    theil_sen convention) — so the full 3-step trajectory is
    hash-exact. Output: one row per step with the gradient sums and
    post-update weights.

    Scale shape: per-step cost is ONE map_batches pass emitting 3
    ints per batch + a driver fold of those partials; the model (2
    ints) broadcasts by closure. This is exactly how full-batch GD
    distributes — gradient partials combine, weights are
    broadcast-sized by definition."""
    ds = _read(sf_dir, "documents", ["n_chars", "lang"])

    def fdiv(p: int, q: int) -> int:
        return p // q  # python floors; SQL mirrors with a CASE

    w0 = w1 = 0  # e6
    out = []
    for step in range(1, steps + 1):
        w0c, w1c = w0, w1

        def grads(t: pa.Table, w0c=w0c, w1c=w1c) -> pa.Table:
            x = (t["n_chars"].to_numpy(zero_copy_only=False)
                 .astype(np.float64) / 1000.0)
            y = pc.equal(t["lang"], "en") \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            m = (float(w0c) + float(w1c) * x) / 1000000.0
            p = 1.0 / (1.0 + np.exp(-m))
            g0 = _round_half_away((p - y) * 1000000.0)
            g1 = _round_half_away(((p - y) * x) * 1000000.0)
            return pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "g0": pa.array([int(g0.sum())], pa.int64()),
                "g1": pa.array([int(g1.sum())], pa.int64())})

        parts = ds.map_batches(grads, batch_format="pyarrow").take_all()
        n = sum(int(r["n"]) for r in parts)
        g0 = sum(int(r["g0"]) for r in parts)
        g1 = sum(int(r["g1"]) for r in parts)
        w0 = w0 - fdiv(g0, 4 * n)
        w1 = w1 - fdiv(g1, 4 * n)
        out.append((step, n, g0, g1, w0, w1))
    return pa.table({
        "step": pa.array([o[0] for o in out], pa.int64()),
        "n": pa.array([o[1] for o in out], pa.int64()),
        "g0_e6": pa.array([o[2] for o in out], pa.int64()),
        "g1_e6": pa.array([o[3] for o in out], pa.int64()),
        "w0_e6": pa.array([o[4] for o in out], pa.int64()),
        "w1_e6": pa.array([o[5] for o in out], pa.int64())})


LOGREG_FIT_SQL = """
WITH f AS (SELECT CAST(n_chars AS DOUBLE) / 1000.0 AS x,
                  CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
           FROM documents),
n_ AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
s1 AS (SELECT
  CAST(sum(CAST(round((1.0 / (1.0 + exp(-((0.0 + 0.0 * x)
    / 1000000.0))) - y) * 1000000.0) AS BIGINT)) AS BIGINT) AS g0,
  CAST(sum(CAST(round(((1.0 / (1.0 + exp(-((0.0 + 0.0 * x)
    / 1000000.0))) - y) * x) * 1000000.0) AS BIGINT)) AS BIGINT) AS g1
  FROM f),
w1_ AS (SELECT g0, g1,
  0 - (CASE WHEN g0 >= 0 THEN g0 // (4 * n)
            ELSE -(((-g0) + 4 * n - 1) // (4 * n)) END) AS w0,
  0 - (CASE WHEN g1 >= 0 THEN g1 // (4 * n)
            ELSE -(((-g1) + 4 * n - 1) // (4 * n)) END) AS w1
  FROM s1, n_),
s2 AS (SELECT
  CAST(sum(CAST(round((1.0 / (1.0 + exp(-((CAST(w.w0 AS DOUBLE)
    + CAST(w.w1 AS DOUBLE) * x) / 1000000.0))) - y) * 1000000.0)
    AS BIGINT)) AS BIGINT) AS g0,
  CAST(sum(CAST(round(((1.0 / (1.0 + exp(-((CAST(w.w0 AS DOUBLE)
    + CAST(w.w1 AS DOUBLE) * x) / 1000000.0))) - y) * x) * 1000000.0)
    AS BIGINT)) AS BIGINT) AS g1
  FROM f, w1_ w),
w2_ AS (SELECT s2.g0, s2.g1,
  w.w0 - (CASE WHEN s2.g0 >= 0 THEN s2.g0 // (4 * n)
               ELSE -(((-s2.g0) + 4 * n - 1) // (4 * n)) END) AS w0,
  w.w1 - (CASE WHEN s2.g1 >= 0 THEN s2.g1 // (4 * n)
               ELSE -(((-s2.g1) + 4 * n - 1) // (4 * n)) END) AS w1
  FROM s2, w1_ w, n_),
s3 AS (SELECT
  CAST(sum(CAST(round((1.0 / (1.0 + exp(-((CAST(w.w0 AS DOUBLE)
    + CAST(w.w1 AS DOUBLE) * x) / 1000000.0))) - y) * 1000000.0)
    AS BIGINT)) AS BIGINT) AS g0,
  CAST(sum(CAST(round(((1.0 / (1.0 + exp(-((CAST(w.w0 AS DOUBLE)
    + CAST(w.w1 AS DOUBLE) * x) / 1000000.0))) - y) * x) * 1000000.0)
    AS BIGINT)) AS BIGINT) AS g1
  FROM f, w2_ w),
w3_ AS (SELECT s3.g0, s3.g1,
  w.w0 - (CASE WHEN s3.g0 >= 0 THEN s3.g0 // (4 * n)
               ELSE -(((-s3.g0) + 4 * n - 1) // (4 * n)) END) AS w0,
  w.w1 - (CASE WHEN s3.g1 >= 0 THEN s3.g1 // (4 * n)
               ELSE -(((-s3.g1) + 4 * n - 1) // (4 * n)) END) AS w1
  FROM s3, w2_ w, n_)
SELECT 1 AS step, n_.n, w1_.g0 AS g0_e6, w1_.g1 AS g1_e6,
       CAST(w1_.w0 AS BIGINT) AS w0_e6, CAST(w1_.w1 AS BIGINT) AS w1_e6
FROM w1_, n_
UNION ALL
SELECT 2, n_.n, w2_.g0, w2_.g1, CAST(w2_.w0 AS BIGINT),
       CAST(w2_.w1 AS BIGINT) FROM w2_, n_
UNION ALL
SELECT 3, n_.n, w3_.g0, w3_.g1, CAST(w3_.w0 AS BIGINT),
       CAST(w3_.w1 AS BIGINT) FROM w3_, n_
"""


def rich_club_graph(sf_dir: str, driver_max: int = 2_000_000):
    """RICH-CLUB COEFFICIENT curve (Zhou & Mondragón 2004) of the
    orders-derived test graph — do high-degree hubs preferentially
    link to each other? For k ∈ {1, 2, 4, 8, 16}: the club is the
    nodes with degree > k, and φ(k) = 2·E_k / (N_k(N_k−1)) is the
    fraction of possible club-internal edges realized. EXACT integer
    rationals (φ e6 = 2·E_k·10⁶ // (N_k(N_k−1))), hash-exact SQL.

    Scale shape: one both-endpoints explode + a vertex-bounded degree
    groupby; the degree table (gate-asserted ≤ ``driver_max`` rows)
    broadcasts ONCE via ``ray.put`` and each edge batch counts its
    club memberships vectorized — no per-k passes, no edge shuffle.
    Past the gate the same semantics run as two hash joins of edges
    against the degree table."""
    edges = _orders_graph_edges(sf_dir)

    def both_ends(t: pa.Table) -> pa.Table:
        v = np.concatenate([t["a"].to_numpy(zero_copy_only=False),
                            t["b"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    deg_rows = (edges.map_batches(both_ends, batch_format="pyarrow")
                .groupby("v").aggregate(Sum("c", alias_name="d"))
                .take_all())  # bounded by the vertex count
    assert len(deg_rows) <= driver_max, \
        f"rich-club degree table gated at {driver_max} vertices"
    deg = {int(r["v"]): int(r["d"]) for r in deg_rows}
    ks = [1, 2, 4, 8, 16]
    n_k = {k: sum(1 for d in deg.values() if d > k) for k in ks}
    dref = ray.put(deg)

    def club_edges(t: pa.Table) -> pa.Table:
        dd = ray.get(dref)
        da = pd.Series(t["a"].to_numpy(zero_copy_only=False)).map(dd) \
            .to_numpy(np.int64)
        db = pd.Series(t["b"].to_numpy(zero_copy_only=False)).map(dd) \
            .to_numpy(np.int64)
        m = np.minimum(da, db)
        return pa.table({
            "k": pa.array(ks, pa.int64()),
            "e": pa.array([int((m > k).sum()) for k in ks], pa.int64())})

    e_rows = (edges.map_batches(club_edges, batch_format="pyarrow")
              .groupby("k").aggregate(Sum("e", alias_name="e"))
              .take_all())
    e_k = {int(r["k"]): int(r["e"]) for r in e_rows}
    phi = []
    for k in ks:
        nk = n_k[k]
        phi.append(2 * e_k.get(k, 0) * 1_000_000 // (nk * (nk - 1))
                   if nk >= 2 else 0)
    return pa.table({
        "k": pa.array(ks, pa.int64()),
        "n_nodes": pa.array([n_k[k] for k in ks], pa.int64()),
        "n_edges": pa.array([e_k.get(k, 0) for k in ks], pa.int64()),
        "phi_e6": pa.array(phi, pa.int64())})


RICH_CLUB_SQL = """
WITH e AS (
  SELECT DISTINCT
    LEAST(o_custkey, o_orderkey % 1500 + 1)    AS a,
    GREATEST(o_custkey, o_orderkey % 1500 + 1) AS b
  FROM orders
  WHERE o_custkey <> o_orderkey % 1500 + 1),
deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
        GROUP BY v),
ks AS (SELECT unnest([1, 2, 4, 8, 16]) AS k),
nk AS (SELECT ks.k, CAST(count(deg.v) AS BIGINT) AS n_nodes
       FROM ks LEFT JOIN deg ON deg.d > ks.k GROUP BY ks.k),
ek AS (SELECT ks.k, CAST(count(d1) AS BIGINT) AS n_edges
       FROM ks LEFT JOIN (
         SELECT da.d AS d1, db.d AS d2
         FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b)
         ON least(d1, d2) > ks.k
       GROUP BY ks.k)
SELECT CAST(nk.k AS BIGINT) AS k, nk.n_nodes, ek.n_edges,
       CASE WHEN nk.n_nodes >= 2
            THEN CAST(2 * ek.n_edges * 1000000
                      // (nk.n_nodes * (nk.n_nodes - 1)) AS BIGINT)
            ELSE 0 END AS phi_e6
FROM nk JOIN ek ON ek.k = nk.k
"""


def user_journey_strings(sf_dir: str, topk: int = 10):
    """TOP USER JOURNEYS — the path-analysis staple next to the
    funnel: each user's first THREE event types (by ts, event_id)
    joined `a>b>c`, ranked by how many users share the prefix
    (count desc, journey asc — deterministic cut). Users with fewer
    than 3 events don't form a journey.

    Scale shape: one ``groupby(user_id)`` co-partition (per-group
    head-3 + join), then a groupby over the journey vocabulary —
    bounded by |event types|³, corpus-size-independent — and a ≤ that
    driver sort."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 3:
            return pd.DataFrame({"journey": np.array([], object)})
        g = g.sort_values(["ts", "event_id"], kind="stable").head(3)
        return pd.DataFrame(
            {"journey": [">".join(g["event_type"].tolist())]})

    rows = (ds.groupby("user_id")
            .map_groups(per_user, batch_format="pandas")
            .groupby("journey").aggregate(Count(alias_name="n_users"))
            .take_all())  # ≤ |event types|³ rows
    rows.sort(key=lambda r: (-r["n_users"], r["journey"]))
    rows = rows[:topk]
    return pa.table({
        "journey": pa.array([r["journey"] for r in rows], pa.string()),
        "n_users": pa.array([int(r["n_users"]) for r in rows],
                            pa.int64())})


USER_JOURNEY_SQL = """
WITH r AS (SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events),
j AS (SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS journey
      FROM r WHERE rn <= 3 GROUP BY user_id HAVING count(*) = 3)
SELECT journey, CAST(count(*) AS BIGINT) AS n_users
FROM j GROUP BY journey
ORDER BY n_users DESC, journey LIMIT 10
"""


def gram_novelty_docs(sf_dir: str, driver_max: int = 5_000_000):
    """Per-document GRAM NOVELTY — the redundancy accounting a
    curriculum/mixing pipeline reads next to dup-span stats: of a
    doc's DISTINCT word 5-grams, how many occur in NO earlier doc
    (first occurrence = min doc_id over the corpus — the
    vocab_growth_curve rule lifted from tokens to grams)?
    novelty_e6 = n_novel·10⁶ // n_distinct. Exact integers; the
    dup_span 128-bit hashed-gram convention (gram strings never leave
    the explode task; two SipHash64 halves, collision odds ~n²/2¹²⁹).

    Scale shape: one explode pass emits per-batch-DEDUP'd
    (g1, g2, doc_id) rows; below the instance gate everything folds
    on the driver through Arrow C++ hash aggregates (zero shuffles);
    above it the identical semantics run distributed — a (g1, g2)
    Min-groupby for first-owners, per-batch owner counts, and ONE
    final groupby(doc_id) merging the distinct-count and novel-count
    partials through a union (no join). Two-form equality
    pytest-asserted."""
    import pandas.util as pdu

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_rows(t: pa.Table) -> pa.Table:
        grams, gpar, _ = F_text.kgram_rows(t["text"].combine_chunks(), 5)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[gpar]
        garr = np.asarray(grams, dtype=object)
        g1 = pdu.hash_array(garr, categorize=False).view(np.int64)
        g2 = pdu.hash_array(garr, hash_key="rendlernovelty2!",
                            categorize=False).view(np.int64)
        df = pd.DataFrame({"g1": g1, "g2": g2, "doc_id": ids}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def doc_totals(t: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(
            pc.split_pattern(t["text"], " ")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "tf": pa.array(np.maximum(ntok - 4, 1),
                                        pa.int64())})

    tot = ds.map_batches(doc_totals, batch_format="pyarrow") \
        .aggregate(Sum("tf", alias_name="tot"))["tot"] or 0
    pairs = ds.map_batches(gram_rows, batch_format="pyarrow")

    if tot <= driver_max:
        ptbl = pa.concat_tables(
            pairs.iter_batches(batch_size=None, batch_format="pyarrow"))
        nd = pa.TableGroupBy(ptbl, "doc_id").aggregate([("g1", "count")])
        mn = pa.TableGroupBy(ptbl, ["g1", "g2"]).aggregate(
            [("doc_id", "min")])
        nv = pa.TableGroupBy(mn, "doc_id_min").aggregate(
            [("g1", "count")])
        nvd = dict(zip(nv["doc_id_min"].to_pylist(),
                       nv["g1_count"].to_pylist()))
        doc = nd["doc_id"].to_pylist()
        ndist = [int(v) for v in nd["g1_count"].to_pylist()]
        nnov = [int(nvd.get(d, 0)) for d in doc]
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "n_distinct": pa.array(ndist, pa.int64()),
            "n_novel": pa.array(nnov, pa.int64()),
            "novelty_e6": pa.array(
                [nv_ * 1_000_000 // nd_ for nv_, nd_ in
                 zip(nnov, ndist)], pa.int64())})

    # distributed: same semantics, two int-keyed exchanges, no join
    pairs = pairs.materialize()

    def dcount(t: pa.Table) -> pa.Table:
        # materialize may split a doc's rows across blocks — partials
        u, c = np.unique(t["doc_id"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"doc_id": pa.array(u, pa.int64()),
                         "nd": pa.array(c.astype(np.int64), pa.int64()),
                         "nv": pa.array(np.zeros(len(u), np.int64))})

    def ocount(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["min(doc_id)"].to_numpy(
            zero_copy_only=False), return_counts=True)
        return pa.table({"doc_id": pa.array(u, pa.int64()),
                         "nd": pa.array(np.zeros(len(u), np.int64)),
                         "nv": pa.array(c.astype(np.int64), pa.int64())})

    owners = (pairs.groupby(["g1", "g2"])
              .aggregate(Min("doc_id"))
              .map_batches(ocount, batch_format="pyarrow"))
    merged = (pairs.map_batches(dcount, batch_format="pyarrow")
              .union(owners)
              .groupby("doc_id")
              .aggregate(Sum("nd", alias_name="n_distinct"),
                         Sum("nv", alias_name="n_novel")))

    def finish(t: pa.Table) -> pa.Table:
        nd_ = t["n_distinct"].to_numpy(zero_copy_only=False)
        nv_ = t["n_novel"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_distinct": t["n_distinct"],
            "n_novel": t["n_novel"],
            "novelty_e6": pa.array(nv_ * 1_000_000 // nd_, pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow")


GRAM_NOVELTY_SQL = """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
           FROM documents),
g AS (SELECT doc_id, toks,
             unnest(generate_series(1, len(toks) - 4)) AS i
      FROM t WHERE len(toks) >= 5),
gr AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               || ' ' || toks[i+3] || ' ' || toks[i+4] AS gram FROM g
       UNION ALL
       SELECT doc_id, text AS gram FROM t WHERE len(toks) < 5),
dg AS (SELECT DISTINCT doc_id, gram FROM gr),
nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct
       FROM dg GROUP BY doc_id),
mn AS (SELECT gram, min(doc_id) AS mdoc FROM dg GROUP BY gram),
nv AS (SELECT mdoc AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
       FROM mn GROUP BY mdoc)
SELECT nd.doc_id, nd.n_distinct,
       CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(COALESCE(nv.n_novel, 0) * 1000000 // nd.n_distinct
            AS BIGINT) AS novelty_e6
FROM nd LEFT JOIN nv ON nv.doc_id = nd.doc_id
"""


def bigram_greedy_generate(sf_dir: str, steps: int = 15,
                           driver_max: int = 5_000_000):
    """GREEDY DECODING from a corpus-fitted bigram language model —
    the engine fits an n-gram LM on-cluster and DECODES from it, the
    classic Shannon'48 text-generation demo turned smoke test for the
    whole fit+serve loop. Start = the corpus's most frequent token
    (the shared freq-desc/token-asc cut), then ``steps`` greedy
    argmax moves next = argmax_c count(prev, ·) with token-asc
    tie-break; the walk stops early if the prefix has no successor.
    Deterministic and EXACTLY SQL-expressible: the oracle replays the
    identical argmax walk through a recursive CTE with a correlated
    ORDER BY c DESC, w2 LIMIT 1 subquery (the random_walks_crawl
    md5-rule precedent, but argmax instead of hash-mod).

    Scale shape: one per-batch bigram combine feeds either a driver
    Arrow fold (≤ ``driver_max`` combined rows — the pmi gate) or, at
    scale, the distributed bigram groupby + ``steps`` broadcast-
    filtered argmax probes (each a one-row sort+limit over the
    prefix's successors). Two-form equality pytest-asserted."""
    ds = _read(sf_dir, "documents", ["text"])
    start = _token_freq_topk(ds, 1)
    if not start:
        return pa.table({"step": pa.array([], pa.int64()),
                         "token": pa.array([], pa.string())})
    cur = start[0]

    def bigrams(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        same = par[:-1] == par[1:]
        g = (pd.DataFrame({"w1": flat[:-1][same], "w2": flat[1:][same],
                           "c": 1})
             .groupby(["w1", "w2"], as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    bg = ds.map_batches(bigrams, batch_format="pyarrow")
    tables, nrows, over = [], 0, False
    for b in bg.iter_batches(batch_size=None, batch_format="pyarrow"):
        tables.append(b)
        nrows += b.num_rows
        if nrows > driver_max:
            over = True
            break

    out = [(0, cur)]
    if not over:
        t = pa.concat_tables(tables).group_by(["w1", "w2"]) \
            .aggregate([("c", "sum")]).rename_columns(["w1", "w2", "c"])
        best = (t.to_pandas()
                .sort_values(["w1", "c", "w2"],
                             ascending=[True, False, True])
                .drop_duplicates("w1").set_index("w1")["w2"])
        for s in range(1, steps + 1):
            if cur not in best.index:
                break
            cur = best[cur]
            out.append((s, cur))
    else:
        bgd = (bg.groupby(["w1", "w2"])
               .aggregate(Sum("c", alias_name="c")).materialize())
        for s in range(1, steps + 1):
            cand = (bgd.map_batches(
                lambda t, p=cur: t.filter(pc.equal(t["w1"], p)),
                batch_format="pyarrow")
                .sort(["c", "w2"], descending=[True, False])
                .limit(1).take_all())
            if not cand:
                break
            cur = cand[0]["w2"]
            out.append((s, cur))
    return pa.table({
        "step": pa.array([o[0] for o in out], pa.int64()),
        "token": pa.array([o[1] for o in out], pa.string())})


BIGRAM_GENERATE_SQL = """
WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks
                     FROM documents),
g AS (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
      FROM t WHERE len(toks) >= 2),
bg AS (SELECT toks[i] AS w1, toks[i+1] AS w2,
              CAST(count(*) AS BIGINT) AS c
       FROM g GROUP BY w1, w2),
st AS (SELECT token FROM (SELECT unnest(string_split(text, ' '))
                            AS token FROM documents) tk
       GROUP BY token ORDER BY count(*) DESC, token LIMIT 1),
walk(step, token) AS (
  SELECT CAST(0 AS BIGINT), token FROM st
  UNION ALL
  SELECT w.step + 1,
         (SELECT w2 FROM bg WHERE w1 = w.token
          ORDER BY c DESC, w2 LIMIT 1)
  FROM walk w
  WHERE w.step < 15
    AND EXISTS (SELECT 1 FROM bg WHERE w1 = w.token))
SELECT step, token FROM walk
"""


def length_bucket_batching(sf_dir: str, batch_rows: int = 32):
    """LENGTH-BUCKETED BATCHING pad-waste report — the training-
    efficiency measurement behind "sort by length before batching":
    pack docs into fixed 32-row batches in ARRIVAL (doc_id) order vs
    LENGTH-SORTED order and report padded tokens (Σ per-batch
    max_len·rows) vs real tokens. waste_e6 = (padded − total)·10⁶ //
    padded — exact integers, and sorted waste ≤ arrival waste by
    construction (pytest-asserted).

    Scale shape: one token-count pass, then per plan a global
    zip-with-index (``with_row_seq`` — sort + metadata-only offsets),
    a batch-id groupby (n/32 groups) and a 3-int scalar fold. The
    sort is the point of the op: it's exactly the shuffle a real
    length-bucketed loader pays."""
    from rendler_ray.util import with_row_seq

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def lens(t: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(pc.split_pattern(t["text"], " "))
        return pa.table({"doc_id": t["doc_id"],
                         "ln": ntok.cast(pa.int64())})

    L = ds.map_batches(lens, batch_format="pyarrow")
    plans = (("arrival", ["doc_id"]), ("sorted", ["ln", "doc_id"]))
    rows = []
    for plan, keys in plans:
        seq = with_row_seq(L, keys, start=0, column="seq")

        def bid(t: pa.Table, B=batch_rows) -> pa.Table:
            return pa.table({
                "b": pa.array(t["seq"].to_numpy(zero_copy_only=False)
                              // B, pa.int64()),
                "ln": t["ln"]})

        per = (seq.map_batches(bid, batch_format="pyarrow")
               .groupby("b")
               .aggregate(Max("ln", alias_name="mx"),
                          Sum("ln", alias_name="sm"),
                          Count(alias_name="n")))

        def fold(t: pa.Table) -> pa.Table:
            mx = t["mx"].to_numpy(zero_copy_only=False)
            n = t["n"].to_numpy(zero_copy_only=False)
            sm = t["sm"].to_numpy(zero_copy_only=False)
            return pa.table({
                "padded": pa.array([int((mx * n).sum())], pa.int64()),
                "tot": pa.array([int(sm.sum())], pa.int64()),
                "nb": pa.array([t.num_rows], pa.int64())})

        parts = per.map_batches(fold, batch_format="pyarrow").take_all()
        padded = sum(int(r["padded"]) for r in parts)
        tot = sum(int(r["tot"]) for r in parts)
        nb = sum(int(r["nb"]) for r in parts)
        waste = (padded - tot) * 1_000_000 // padded if padded else 0
        rows.append((plan, nb, tot, padded, waste))
    return pa.table({
        "plan": pa.array([r[0] for r in rows], pa.string()),
        "n_batches": pa.array([r[1] for r in rows], pa.int64()),
        "total_tokens": pa.array([r[2] for r in rows], pa.int64()),
        "padded_tokens": pa.array([r[3] for r in rows], pa.int64()),
        "waste_e6": pa.array([r[4] for r in rows], pa.int64())})


LENGTH_BUCKET_SQL = """
WITH l AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS ln
           FROM documents),
a AS (SELECT ln, (row_number() OVER (ORDER BY doc_id) - 1) // 32 AS b
      FROM l),
s AS (SELECT ln,
             (row_number() OVER (ORDER BY ln, doc_id) - 1) // 32 AS b
      FROM l),
ga AS (SELECT b, max(ln) AS mx, sum(ln) AS sm, count(*) AS n
       FROM a GROUP BY b),
gs AS (SELECT b, max(ln) AS mx, sum(ln) AS sm, count(*) AS n
       FROM s GROUP BY b),
u AS (
  SELECT 'arrival' AS plan, CAST(count(*) AS BIGINT) AS n_batches,
         CAST(sum(sm) AS BIGINT) AS total_tokens,
         CAST(sum(mx * n) AS BIGINT) AS padded_tokens FROM ga
  UNION ALL
  SELECT 'sorted', CAST(count(*) AS BIGINT),
         CAST(sum(sm) AS BIGINT), CAST(sum(mx * n) AS BIGINT) FROM gs)
SELECT plan, n_batches, total_tokens, padded_tokens,
       CASE WHEN padded_tokens > 0
            THEN CAST((padded_tokens - total_tokens) * 1000000
                      // padded_tokens AS BIGINT)
            ELSE 0 END AS waste_e6
FROM u
"""


def event_seq_entropy(sf_dir: str):
    """CONDITIONAL ENTROPY H(next | prev) of the event-type stream per
    user — the sequence-predictability number that tells a
    next-event model how much signal the transition structure holds
    (0 bits = deterministic journeys, ln|types| = memoryless). Per
    prev type: n = outgoing transitions, h_e6 = Σ_next
    round((c/n)·ln(n/c)·10⁶) — per-(prev, next) terms e6-rounded
    BEFORE the sum (the token-entropy convention) with the float tree
    mirrored verbatim in SQL.

    Scale shape: one groupby(user_id) co-partition emits per-group
    (prev, next) pair counts; the transition table is bounded by
    |event types|², so the fold is corpus-size-independent."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        et = g["event_type"].to_numpy(object)
        if len(et) < 2:
            return pd.DataFrame({"prev": np.array([], object),
                                 "nxt": np.array([], object),
                                 "c": np.array([], np.int64)})
        return (pd.DataFrame({"prev": et[:-1], "nxt": et[1:], "c": 1})
                .groupby(["prev", "nxt"], as_index=False).sum())

    rows = (ds.groupby("user_id")
            .map_groups(per_user, batch_format="pandas")
            .groupby(["prev", "nxt"])
            .aggregate(Sum("c", alias_name="c"))
            .take_all())  # ≤ |event types|² rows
    totals: dict[str, int] = {}
    for r in rows:
        totals[r["prev"]] = totals.get(r["prev"], 0) + int(r["c"])
    h: dict[str, int] = {p: 0 for p in totals}
    for r in rows:
        c, n = int(r["c"]), totals[r["prev"]]
        term = (c / n) * np.log(n / c) * 1_000_000.0
        h[r["prev"]] += int(_round_half_away(np.array([term]))[0])
    prevs = sorted(totals)
    return pa.table({
        "prev": pa.array(prevs, pa.string()),
        "n": pa.array([totals[p] for p in prevs], pa.int64()),
        "h_e6": pa.array([h[p] for p in prevs], pa.int64())})


EVENT_SEQ_ENTROPY_SQL = """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS nxt
           FROM events),
p AS (SELECT event_type AS prev, nxt, CAST(count(*) AS BIGINT) AS c
      FROM s WHERE nxt IS NOT NULL GROUP BY prev, nxt),
n_ AS (SELECT prev, CAST(sum(c) AS BIGINT) AS n FROM p GROUP BY prev)
SELECT p.prev, n_.n AS n,
       CAST(sum(CAST(round((CAST(c AS DOUBLE) / n_.n)
                           * ln(CAST(n_.n AS DOUBLE) / c)
                           * 1000000.0) AS BIGINT)) AS BIGINT) AS h_e6
FROM p JOIN n_ ON n_.prev = p.prev
GROUP BY p.prev, n_.n
"""


def seasonal_decompose_daily(sf_dir: str):
    """ADDITIVE SEASONAL DECOMPOSITION of daily event volume (the
    STL-lite y = trend + weekly seasonal + residual every traffic
    dashboard draws): trend = centered 7-row moving sum·10⁶ // 7
    (rows with a full window only), weekly seasonal = per-(day mod 7)
    floor-mean of the detrended values (explicit floor-division CASE —
    detrended values go negative), residual = the exact remainder, so
    trend + seasonal + residual == y·10⁶ row-for-row by construction
    (pytest-asserted). All integers, hash-exact.

    Scale shape: the bounded daily fold (≤ 3653 rows/decade) + an
    O(#days) driver pass; nothing beyond day-count partials
    shuffles."""
    ds = _read(sf_dir, "events", ["ts"])

    def days(t: pa.Table) -> pa.Table:
        d = (t["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64)) // 86_400_000_000
        u, c = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    daily = (ds.map_batches(days, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="c")))
    rows = sorted((int(r["day"]), int(r["c"])) for r in daily.take_all())
    D = len(rows)
    recs = []  # (day, c, dow, trend_e6, det_e6)
    for i in range(3, D - 3):
        s7 = sum(c for _, c in rows[i - 3:i + 4])
        day, c = rows[i]
        tr = s7 * 1_000_000 // 7
        recs.append((day, c, day % 7, tr, c * 1_000_000 - tr))
    num: dict[int, int] = {}
    den: dict[int, int] = {}
    for _, _, dow, _, det in recs:
        num[dow] = num.get(dow, 0) + det
        den[dow] = den.get(dow, 0) + 1
    sea = {d: num[d] // den[d] for d in num}  # python // floors
    return pa.table({
        "day": pa.array([r[0] for r in recs], pa.int64()),
        "n": pa.array([r[1] for r in recs], pa.int64()),
        "dow": pa.array([r[2] for r in recs], pa.int64()),
        "trend7_e6": pa.array([r[3] for r in recs], pa.int64()),
        "seasonal_e6": pa.array([sea[r[2]] for r in recs], pa.int64()),
        "resid_e6": pa.array([r[4] - sea[r[2]] for r in recs],
                             pa.int64())})


SEASONAL_DECOMP_SQL = """
WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY day),
w AS (SELECT day, c,
             sum(c) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                          AND 3 FOLLOWING) AS s7,
             count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS k7
      FROM d),
t AS (SELECT day, c, day % 7 AS dow,
             s7 * 1000000 // 7 AS trend7_e6,
             c * 1000000 - s7 * 1000000 // 7 AS det_e6
      FROM w WHERE k7 = 7),
sea AS (SELECT dow, CAST(sum(det_e6) AS BIGINT) AS num,
               CAST(count(*) AS BIGINT) AS den
        FROM t GROUP BY dow),
sef AS (SELECT dow,
               CASE WHEN num >= 0 THEN num // den
                    ELSE -(((-num) + den - 1) // den) END AS seasonal_e6
        FROM sea)
SELECT t.day, t.c AS n, t.dow, CAST(t.trend7_e6 AS BIGINT) AS trend7_e6,
       CAST(sef.seasonal_e6 AS BIGINT) AS seasonal_e6,
       CAST(t.det_e6 - sef.seasonal_e6 AS BIGINT) AS resid_e6
FROM t JOIN sef ON sef.dow = t.dow
"""


def sorted_neighborhood_pairs(sf_dir: str, window: int = 4):
    """SORTED-NEIGHBORHOOD record-linkage blocking (Hernández–Stolfo
    SIGMOD'95) over customer names — the other classic ER blocking
    next to the SymSpell deletion banding of
    :func:`fuzzy_name_pairs`: sort the distinct keys once, compare
    each key only with its ``window`` successors, verify edit
    distance ≤ 1 exactly. Unlike the deletion banding this is
    recall-LIMITED by construction (a true pair > ``window`` ranks
    apart is missed) — the pytest measures that recall against the
    complete fuzzy join, which is the operational point of the op.

    Scale shape: one distinct groupby + one ``with_row_seq``
    zip-with-index + ONE int-keyed hash join (each name emits
    ``window`` probe rows keyed rank+j against the base keyed rank),
    then a vectorized verify — no all-pairs, no string-keyed
    exchange."""
    from rendler_ray.util import with_row_seq

    names = _read(sf_dir, "customer", ["c_name"]) \
        .groupby("c_name").aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["c_name"]),
                     batch_format="pyarrow")
    seq = with_row_seq(names, ["c_name"], start=0, column="rnk")

    def base(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["rnk"], "name_a": t["c_name"]})

    def probes(t: pa.Table, w=window) -> pa.Table:
        r = t["rnk"].to_numpy(zero_copy_only=False)
        nm = t["c_name"].to_numpy(zero_copy_only=False)
        ks = np.concatenate([r + j for j in range(1, w + 1)])
        return pa.table({"k": pa.array(ks, pa.int64()),
                         "name_b": pa.array(np.tile(nm, w), pa.string())})

    cand = (seq.map_batches(probes, batch_format="pyarrow")
            .join(seq.map_batches(base, batch_format="pyarrow"),
                  join_type="inner", num_partitions=8, on=("k",)))

    def verify(t: pa.Table) -> pa.Table:
        # probes carry the LOWER-ranked name as name_b: in sorted
        # order name_b < name_a, emit canonically (min, max)
        a = t["name_b"].to_numpy(zero_copy_only=False)
        b = t["name_a"].to_numpy(zero_copy_only=False)
        keep = _ed_le1_mask(a, b)
        return pa.table({"name_a": pa.array(a[keep], pa.string()),
                         "name_b": pa.array(b[keep], pa.string())})

    return cand.map_batches(verify, batch_format="pyarrow")


SORTED_NEIGHBORHOOD_SQL = """
WITH n AS (SELECT DISTINCT c_name FROM customer),
r AS (SELECT c_name,
             row_number() OVER (ORDER BY c_name) - 1 AS rnk FROM n)
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM r a JOIN r b
  ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + 4
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def doc_feature_corr_matrix(sf_dir: str):
    """Pairwise PEARSON CORRELATION matrix over per-doc features
    (n_chars, n_tokens, max token length) — the feature-EDA table a
    quality-model owner reads before training (near-1 pairs are
    redundant features). Integer moments (n, Σx, Σy, Σx², Σy², Σxy)
    are exact through one shuffle-free combine; per pair
    num = nΣxy − ΣxΣy and variances d1, d2 are exact ints, and the
    only float is corr = num / sqrt(d1·d2) with the expression tree
    mirrored verbatim in SQL, floor·10⁶ (the welch convention).

    Scale shape: ONE corpus pass emitting a 1-row 10-int partial per
    batch + a scalar driver fold — no shuffle at all."""
    import math

    ds = _read(sf_dir, "documents", ["n_chars", "text"])

    def moments(t: pa.Table) -> pa.Table:
        x1 = t["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        x2 = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tl = pc.utf8_length(pc.list_flatten(toks)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        x3 = np.zeros(t.num_rows, np.int64)
        np.maximum.at(x3, par, tl)
        cols = {"n": np.int64(t.num_rows)}
        for nm, v in (("x1", x1), ("x2", x2), ("x3", x3)):
            cols["s_" + nm] = v.sum()
            cols["q_" + nm] = (v * v).sum()
        for anm, bnm, a, b in (("x1", "x2", x1, x2),
                               ("x1", "x3", x1, x3),
                               ("x2", "x3", x2, x3)):
            cols[f"p_{anm}{bnm}"] = (a * b).sum()
        return pa.table({k: pa.array([int(v)], pa.int64())
                         for k, v in cols.items()})

    parts = ds.map_batches(moments, batch_format="pyarrow").take_all()
    tot = {k: sum(int(r[k]) for r in parts) for k in parts[0]}
    n = tot["n"]
    names = {"x1": "n_chars", "x2": "n_tokens", "x3": "max_tok_len"}
    out = []
    for a, b in (("x1", "x2"), ("x1", "x3"), ("x2", "x3")):
        num = n * tot[f"p_{a}{b}"] - tot["s_" + a] * tot["s_" + b]
        d1 = n * tot["q_" + a] - tot["s_" + a] ** 2
        d2 = n * tot["q_" + b] - tot["s_" + b] ** 2
        corr = (math.floor(num / math.sqrt(float(d1) * float(d2))
                           * 1_000_000.0)
                if d1 > 0 and d2 > 0 else 0)
        out.append((names[a], names[b], corr))
    return pa.table({
        "feat_a": pa.array([o[0] for o in out], pa.string()),
        "feat_b": pa.array([o[1] for o in out], pa.string()),
        "n": pa.array([n] * len(out), pa.int64()),
        "corr_e6": pa.array([o[2] for o in out], pa.int64())})


DOC_FEATURE_CORR_SQL = """
WITH f AS (SELECT CAST(n_chars AS BIGINT) AS x1,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS x2,
                  CAST((SELECT max(length(t.tok)) FROM
                        unnest(string_split(text, ' ')) AS t(tok))
                       AS BIGINT) AS x3
           FROM documents),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x1) AS HUGEINT) AS s1,
             CAST(sum(x2) AS HUGEINT) AS s2,
             CAST(sum(x3) AS HUGEINT) AS s3,
             CAST(sum(x1 * x1) AS HUGEINT) AS q1,
             CAST(sum(x2 * x2) AS HUGEINT) AS q2,
             CAST(sum(x3 * x3) AS HUGEINT) AS q3,
             CAST(sum(x1 * x2) AS HUGEINT) AS p12,
             CAST(sum(x1 * x3) AS HUGEINT) AS p13,
             CAST(sum(x2 * x3) AS HUGEINT) AS p23
      FROM f),
p AS (
  SELECT 'n_chars' AS feat_a, 'n_tokens' AS feat_b, n,
         n * p12 - s1 * s2 AS num, n * q1 - s1 * s1 AS d1,
         n * q2 - s2 * s2 AS d2 FROM m
  UNION ALL
  SELECT 'n_chars', 'max_tok_len', n, n * p13 - s1 * s3,
         n * q1 - s1 * s1, n * q3 - s3 * s3 FROM m
  UNION ALL
  SELECT 'n_tokens', 'max_tok_len', n, n * p23 - s2 * s3,
         n * q2 - s2 * s2, n * q3 - s3 * s3 FROM m)
SELECT feat_a, feat_b, CAST(n AS BIGINT) AS n,
       CASE WHEN d1 > 0 AND d2 > 0
            THEN CAST(floor(CAST(num AS DOUBLE)
                            / sqrt(CAST(d1 AS DOUBLE)
                                   * CAST(d2 AS DOUBLE))
                            * 1000000.0) AS BIGINT)
            ELSE 0 END AS corr_e6
FROM p
"""


def revenue_pareto_customers(sf_dir: str):
    """REVENUE PARETO (80/20) decile table — the BI staple: customers
    ranked by total spend, split into 10 equal-rank deciles (decile 0
    = top spenders), each with its customer count, spend, revenue
    share and cumulative share. Exact integers: share_e6 =
    spend·10⁶ // total, cumulative share as suffix-exact running
    sums of spend (cum·10⁶ // total) so no rounding accumulates.

    Scale shape: one orders groupby(custkey) (customer-bounded), one
    ``with_row_seq`` zip-with-index over (spend, custkey), a 10-row
    decile groupby, driver fold of 10 rows. Rank ties share a spend
    value, so decile boundaries are deterministic."""
    from rendler_ray.util import with_row_seq

    ds = _fixed_point(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        {"o_totalprice": 2})
    spend = ds.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="spend_c"))
    n_cust = spend.count()
    seq = with_row_seq(spend, ["spend_c", "o_custkey"], start=0,
                       column="seq")

    def decile(t: pa.Table, n=n_cust) -> pa.Table:
        r = n - 1 - t["seq"].to_numpy(zero_copy_only=False)  # desc rank
        return pa.table({
            "decile": pa.array(r * 10 // n, pa.int64()),
            "n_customers": pa.array(np.ones(t.num_rows, np.int64)),
            "spend_c": t["spend_c"]})

    rows = (seq.map_batches(decile, batch_format="pyarrow")
            .groupby("decile")
            .aggregate(Sum("n_customers", alias_name="n_customers"),
                       Sum("spend_c", alias_name="spend_c"))
            .take_all())
    rows.sort(key=lambda r: r["decile"])
    total = sum(int(r["spend_c"]) for r in rows)
    cum, cums = 0, []
    for r in rows:
        cum += int(r["spend_c"])
        cums.append(cum)
    return pa.table({
        "decile": pa.array([int(r["decile"]) for r in rows], pa.int64()),
        "n_customers": pa.array([int(r["n_customers"]) for r in rows],
                                pa.int64()),
        "spend_c": pa.array([int(r["spend_c"]) for r in rows],
                            pa.int64()),
        "share_e6": pa.array(
            [int(r["spend_c"]) * 1_000_000 // total for r in rows],
            pa.int64()),
        "cum_share_e6": pa.array([c * 1_000_000 // total for c in cums],
                                 pa.int64())})


REVENUE_PARETO_SQL = """
WITH s AS (SELECT o_custkey,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS spend_c
           FROM orders GROUP BY o_custkey),
r AS (SELECT spend_c,
             (row_number() OVER (ORDER BY spend_c DESC,
                                 o_custkey DESC) - 1) * 10
               // (SELECT count(*) FROM s) AS decile
      FROM s),
d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(spend_c) AS BIGINT) AS spend_c
      FROM r GROUP BY decile),
t AS (SELECT CAST(sum(spend_c) AS BIGINT) AS total FROM d)
SELECT decile, n_customers, spend_c,
       CAST(spend_c * 1000000 // t.total AS BIGINT) AS share_e6,
       CAST(CAST(sum(spend_c) OVER (ORDER BY decile) AS BIGINT)
            * 1000000 // t.total AS BIGINT) AS cum_share_e6
FROM d, t
"""


def embedding_dim_stats(sf_dir: str):
    """Per-DIMENSION embedding statistics (dead/outlier-dim report) —
    the vector-column data card a retrieval owner reads before
    quantizing or pruning dims: per dim n, min, max, floor-mean and
    variance of the e6 fixed-point values. Each element is rounded to
    v_e6 = round(v·10⁶) FIRST (f32→f64 exact, the quantize-op
    convention), so all moments are exact integers; mean uses the
    explicit floor-division CASE (values go negative), variance is
    var_e12 = (n·Σv² − (Σv)²) // n² — non-negative by Cauchy–Schwarz.

    Scale shape: one corpus pass with per-batch per-dim partials
    (dims × 5 ints per batch), one dim-bounded groupby (64 rows)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partials(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        if not len(emb):
            return pa.table({
                "i": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "q": pa.array([], pa.int64()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64())})
        d = pc.list_value_length(emb)[0].as_py()
        e = emb.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(len(t), d)
        # int64 BEFORE summing (not float64 — those partials are only
        # exact below 2⁵³); int64 v² sums stay exact for any batch
        # under ~9M rows of e6-scaled unit vectors.
        v = _round_half_away(e * 1_000_000.0).astype(np.int64)
        return pa.table({
            "i": pa.array(np.arange(1, d + 1), pa.int64()),
            "n": pa.array(np.full(d, len(t), np.int64)),
            "s": pa.array(v.sum(0), pa.int64()),
            "q": pa.array((v * v).sum(0), pa.int64()),
            "mn": pa.array(v.min(0), pa.int64()),
            "mx": pa.array(v.max(0), pa.int64())})

    rows = (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("i")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s", alias_name="s"),
                       Sum("q", alias_name="q"),
                       Min("mn", alias_name="mn"),
                       Max("mx", alias_name="mx"))
            .take_all())  # one row per dimension
    rows.sort(key=lambda r: r["i"])
    mean, var = [], []
    for r in rows:
        n, s, q = int(r["n"]), int(r["s"]), int(r["q"])
        mean.append(s // n)  # python floors
        var.append((n * q - s * s) // (n * n))
    return pa.table({
        "i": pa.array([int(r["i"]) for r in rows], pa.int64()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        "mn": pa.array([int(r["mn"]) for r in rows], pa.int64()),
        "mx": pa.array([int(r["mx"]) for r in rows], pa.int64()),
        "mean_e6": pa.array(mean, pa.int64()),
        "var_e12": pa.array(var, pa.int64())})


EMBEDDING_DIM_STATS_SQL = """
WITH x AS (SELECT i,
                  CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                       AS BIGINT) AS v
           FROM embeddings,
                unnest(generate_series(1, len(embedding))) AS t(i)),
g AS (SELECT i, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(v) AS HUGEINT) AS s,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q,
             CAST(min(v) AS BIGINT) AS mn, CAST(max(v) AS BIGINT) AS mx
      FROM x GROUP BY i)
SELECT CAST(i AS BIGINT) AS i, CAST(n AS BIGINT) AS n, mn, mx,
       CAST(CASE WHEN s >= 0 THEN s // n
                 ELSE -(((-s) + n - 1) // n) END AS BIGINT) AS mean_e6,
       CAST((n * q - s * s) // (n * n) AS BIGINT) AS var_e12
FROM g
"""


def gini_mean_difference_values(sf_dir: str):
    """GINI COEFFICIENT of order value — the revenue-inequality number
    next to the Lorenz/Pareto tables, computed from the closed-form
    rank expression: with x sorted ascending (rank i = 1..n),
    Σ|xᵢ−xⱼ| over pairs equals 2·Σ(2i−n−1)xᵢ, so
    gini_e6 = Σ(2i−n−1)xᵢ·10⁶ // ((n−1)·Σx) — EXACT integers, no
    pair explosion (ties make the coefficient independent of tie
    order: equal x share a weight sum that depends only on the rank
    SET). One global sort + zip-with-index replaces the O(n²) pair
    scan.

    Scale shape: one count aggregate, one ``with_row_seq``
    (sort + metadata offsets), one weighted-sum scalar fold."""
    from rendler_ray.util import with_row_seq

    ds = _fixed_point(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
        {"o_totalprice": 2})
    n = ds.count()
    seq = with_row_seq(ds, ["o_totalprice", "o_orderkey"], start=1,
                       column="i")

    def wsum(t: pa.Table, n=n) -> pa.Table:
        i = t["i"].to_numpy(zero_copy_only=False)
        x = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "w": pa.array([int(((2 * i - n - 1) * x).sum())],
                          pa.int64()),
            "s": pa.array([int(x.sum())], pa.int64())})

    parts = seq.map_batches(wsum, batch_format="pyarrow").take_all()
    w = sum(int(r["w"]) for r in parts)
    s = sum(int(r["s"]) for r in parts)
    gini = w * 1_000_000 // ((n - 1) * s) if n > 1 and s > 0 else 0
    return pa.table({"n": pa.array([n], pa.int64()),
                     "sum_c": pa.array([s], pa.int64()),
                     "gini_e6": pa.array([gini], pa.int64())})


GINI_MEAN_DIFF_SQL = """
WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x,
                  o_orderkey
           FROM orders),
r AS (SELECT x, row_number() OVER (ORDER BY x, o_orderkey) AS i FROM v),
n_ AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM r),
s AS (SELECT n_.n AS n, CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum((2 * CAST(i AS HUGEINT) - n_.n - 1) * x)
                  AS HUGEINT) AS w
      FROM r, n_ GROUP BY n_.n)
SELECT CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sum_c,
       CASE WHEN n > 1 AND sx > 0
            THEN CAST(w * 1000000 // ((n - 1) * sx) AS BIGINT)
            ELSE 0 END AS gini_e6
FROM s
"""

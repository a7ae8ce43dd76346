"""Deterministic, Spark-native fixture generation (FIXTURES.md).

Generates the reference-shaped tables (`property_sales` ≙
uk_price_paid, `retail_sales` ≙ sales_data, `user_events`) entirely
as Spark expressions over spark.range(n): every column is a pure
function of (row id, seed) via xxhash64 — deterministic across
partitionings, cluster sizes, and retries, with no driver-side data
generation. At 100 TB-scale generation this matters: spark.range
parallelizes perfectly and nothing is collected.

Distributions follow FIXTURES.md: log-normal price, zipf-ish
categorical skew (pow-transformed uniforms), weighted enums, ~2%
NULL county, the q2 IN-list towns carrying high mass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOWNS = [
    "LONDON", "MANCHESTER", "BRISTOL", "BIRMINGHAM", "NOTTINGHAM",
    "LEEDS", "SHEFFIELD", "LIVERPOOL", "YORK", "OXFORD",
    "CAMBRIDGE", "BRIGHTON", "READING", "NORWICH", "EXETER",
    "DURHAM", "BATH", "CHESTER", "DERBY", "LANCASTER",
]
COUNTIES = [
    "GREATER LONDON", "GREATER MANCHESTER", "WEST MIDLANDS", "WEST YORKSHIRE",
    "MERSEYSIDE", "SOUTH YORKSHIRE", "AVON", "NOTTINGHAMSHIRE",
    "DERBYSHIRE", "KENT", "ESSEX", "SURREY", "HAMPSHIRE", "DEVON",
    "NORFOLK", "OXFORDSHIRE", "CAMBRIDGESHIRE", "LANCASHIRE",
    "DURHAM", "CHESHIRE",
]
TYPES = ["terraced", "semi-detached", "detached", "flat", "other"]
TYPE_W = [0.30, 0.57, 0.79, 0.97, 1.0]  # cumulative .30/.27/.22/.18/.03
DURATIONS = ["freehold", "leasehold", "unknown"]
DURATION_W = [0.75, 0.99, 1.0]


def _u(seed_col: Column, salt: int) -> Column:
    """Deterministic uniform(0,1) from (row, salt)."""
    return (F.pmod(F.xxhash64(seed_col, F.lit(salt)), F.lit(1_000_000)) + 0.5) / 1_000_000.0


def _pick(u: Column, values: list[str], cum_weights: list[float] | None = None) -> Column:
    """Weighted categorical pick from a uniform."""
    if cum_weights is None:
        idx = F.least(F.floor(u * len(values)).cast("int"), F.lit(len(values) - 1))
        arr = F.array(*[F.lit(v) for v in values])
        return F.element_at(arr, idx + 1)
    expr: Column | None = None
    for v, w in zip(values, cum_weights):
        cond = u <= w
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(values[-1])


def property_sales(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """The wide time-series fact table (uk_price_paid shape,
    01-create-table.sql:53-73)."""
    df = spark.range(n_rows).withColumn("_s", F.xxhash64("id", F.lit(seed)))
    s = F.col("_s")
    u_price, u_date = _u(s, 1), _u(s, 2)
    u_pc1, u_pc2 = _u(s, 3), _u(s, 4)
    u_type, u_new, u_dur = _u(s, 5), _u(s, 6), _u(s, 7)
    u_street, u_town, u_cnty, u_null = _u(s, 8), _u(s, 9), _u(s, 10), _u(s, 11)

    # Log-normal price, median ~250k: exp(ln(250000) + 0.8*z),
    # Box-Muller from two uniforms.
    z = F.sqrt(-2.0 * F.log(u_price)) * F.cos(2.0 * 3.141592653589793 * _u(s, 12))
    price = F.least(
        F.greatest((F.exp(F.lit(12.4292) + 0.8 * z)).cast("long"), F.lit(1000)),
        F.lit(50_000_000),
    )
    # Uniform-ish dates 1995..2025 (11322 days).
    date = F.date_add(F.lit("1995-01-01").cast("date"), F.floor(u_date * 11322).cast("int"))
    # Zipf-ish postcodes (pow-skew) — ~3000/~900 distinct.
    pc1 = F.concat(
        _pick(_u(s, 13), [chr(c) for c in range(65, 91)]),
        _pick(_u(s, 14), [chr(c) for c in range(65, 91)]),
        F.floor(F.pow(u_pc1, 2.5) * 99).cast("int").cast("string"),
    )
    pc2 = F.concat(
        F.floor(F.pow(u_pc2, 1.5) * 9).cast("int").cast("string"),
        _pick(_u(s, 15), [chr(c) for c in range(65, 91)]),
        _pick(_u(s, 16), [chr(c) for c in range(65, 91)]),
    )
    town = _pick(F.pow(u_town, 2.2), TOWNS)  # pow-skew → first towns get high mass
    county = F.when(u_null < 0.02, F.lit(None).cast("string")).otherwise(
        _pick(F.pow(u_cnty, 1.8), COUNTIES)
    )
    return df.select(
        price.alias("price"),
        date.alias("date"),
        pc1.alias("postcode1"),
        pc2.alias("postcode2"),
        _pick(u_type, TYPES, TYPE_W).alias("type"),
        (u_new < 0.10).alias("is_new"),
        _pick(u_dur, DURATIONS, DURATION_W).alias("duration"),
        F.concat(F.lit(""), F.floor(_u(s, 17) * 200).cast("int").cast("string")).alias("addr1"),
        F.lit("").alias("addr2"),
        F.concat(_pick(u_street, TOWNS), F.lit(" ST ")).alias("street"),
        F.lit("").alias("locality"),
        town.alias("town"),
        F.concat(F.lit("D"), F.floor(_u(s, 18) * 400).cast("int").cast("string")).alias(
            "district"
        ),
        county.alias("county"),
    )


def retail_sales(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """sales_data shape (01-create-table.sql:5-17): the model's only
    decimal + timestamp columns."""
    df = spark.range(n_rows).withColumn("_s", F.xxhash64("id", F.lit(seed + 1)))
    s = F.col("_s")
    sale_date = F.date_add(F.lit("2024-01-01").cast("date"), F.floor(_u(s, 1) * 365).cast("int"))
    return df.select(
        F.col("id"),
        F.concat(F.lit("product_"), F.floor(_u(s, 2) * 500).cast("int").cast("string")).alias(
            "product_name"
        ),
        _pick(_u(s, 3), ["Electronics", "Furniture", "Clothing", "Food", "Sports",
                         "Books", "Toys", "Garden", "Auto", "Health"]).alias("category"),
        (F.round(_u(s, 4) * 999.0 + 1.0, 2)).cast("decimal(10,2)").alias("price"),
        (F.floor(_u(s, 5) * 100).cast("int") + 1).alias("quantity"),
        sale_date.alias("sale_date"),
        (sale_date.cast("timestamp") + F.make_interval(secs=F.floor(_u(s, 6) * 86400))).alias(
            "created_at"
        ),
    )


def user_events(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """user_events shape (01-create-table.sql:31-41) with ~5%
    late/out-of-order events to exercise watermarks."""
    df = spark.range(n_rows).withColumn("_s", F.xxhash64("id", F.lit(seed + 2)))
    s = F.col("_s")
    base_ts = F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(
        secs=F.col("id") * 30  # monotone arrival
    )
    late = _u(s, 1) < 0.05
    ts = F.when(
        late, base_ts - F.make_interval(secs=F.floor(_u(s, 2) * 36000))
    ).otherwise(base_ts)
    return df.select(
        F.floor(F.pow(_u(s, 3), 2.0) * 10_000).cast("long").alias("user_id"),
        _pick(_u(s, 4), ["page_view", "click", "scroll", "purchase", "logout"]).alias(
            "event_type"
        ),
        ts.alias("event_time"),
        F.concat(F.lit("/page/"), F.floor(_u(s, 5) * 200).cast("int").cast("string")).alias(
            "page_url"
        ),
        F.floor(_u(s, 6) * 600).cast("int").alias("duration"),
    )


def partsupp(spark: SparkSession, n_parts: int, n_suppliers: int, seed: int = 42) -> DataFrame:
    """TPC-H ``partsupp``-shaped micro-fixture: exactly 4 supplier
    offers per part (the TPC-H multiplicity), deterministic from
    (row id, seed) like every other fixture table — no driver-side
    data. The driver's testdata does not carry partsupp
    (COVERAGE.md §2.3), so the four blocked classic shapes
    (Q2/Q11/Q16/Q20) run against this table in pytest only.

    Supplier assignment uses offsets ``i * (n_suppliers div 4)`` from
    the part key, mod n_suppliers — distinct for i in 0..3 whenever
    n_suppliers >= 4 (3 * floor(n/4) < n), mirroring TPC-H's
    stride-based ps_suppkey formula. ps_supplycost is DECIMAL(10,2)
    (exact min/compare on both engines)."""
    per_part = 4
    if n_suppliers < per_part:
        # With fewer suppliers than offers the stride offsets collapse
        # mod n_suppliers and (ps_partkey, ps_suppkey) stops being a
        # primary key — fail loudly instead of silently emitting a
        # non-PK table (ADVICE r5).
        raise ValueError(
            f"partsupp needs n_suppliers >= {per_part} for the TPC-H "
            f"4-distinct-offers multiplicity; got {n_suppliers}"
        )
    step = max(1, n_suppliers // per_part)
    df = spark.range(n_parts * per_part).withColumn(
        "_s", F.xxhash64("id", F.lit(seed + 7))
    )
    s = F.col("_s")
    partkey = F.expr(f"id div {per_part}")
    i = F.pmod(F.col("id"), F.lit(per_part))
    suppkey = F.pmod(partkey + i * step, F.lit(n_suppliers))
    return df.select(
        partkey.alias("ps_partkey"),
        suppkey.cast("long").alias("ps_suppkey"),
        (F.pmod(s, F.lit(9999)) + 1).cast("int").alias("ps_availqty"),
        (F.round(_u(s, 1) * 999.0 + 1.0, 2)).cast("decimal(10,2)").alias(
            "ps_supplycost"
        ),
    )


# ---------------------------------------------------------------------------
# Scale-stress corpora (VERDICT r7 #1): synthetic documents/embeddings
# matching the driver testdata's SCHEMA and measured distributional
# shape (TESTDATA is read-only and tops out at sf0.1 = 17 MB; these
# generate the same shape at 10x/30x so time-vs-data scaling
# exponents can be MEASURED instead of argued from plan shape).
# Distribution facts measured on /root/testdata/sf0.1 (scripts
# committed in scripts/scale_stress.py's calibration): 31-word
# closed vocab, doc length ~U(10,100) words (avg 54), lang en 41% /
# zh,es,fr,de ~15% each, 20 uniform sources, ~9% of docs are
# engineered near-dups sharing long spans with a base doc (8 exact
# text-dup groups at 5000 docs); embeddings are dim-64 L2-normalized
# vectors with NO label-cluster structure (within-label and
# cross-label cosine distributions are identical, ~N(0, 1/64);
# P(cos >= 0.45) ~ 1e-4) and 10 uniform labels.

# The driver corpus's exact vocabulary (sorted), so tokenizer /
# shingle / bigram behavior is directly comparable.
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
DOC_LANGS = ["en", "zh", "es", "fr", "de"]
DOC_LANG_W = [0.41, 0.56, 0.71, 0.86, 1.0]


def documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    dup_rate: float = 0.10,
    base_frac: float = 0.6,
    vocab_size: int | None = None,
) -> DataFrame:
    """documents-shaped corpus (doc_id, text, lang, source, n_chars).

    Near-dup structure: ``dup_rate`` of docs with id >= n_base copy a
    base doc (id hashed into the first ``base_frac`` of ids — the
    base pool scales WITH the corpus, so dup-cluster sizes stay O(1)
    as n grows, which is the property that keeps LSH buckets bounded
    at any scale). Dups are TRUNCATED prefix copies (length factor
    ~U(0.92, 0.99)) plus a 3% exact-copy share — calibrated against
    the testdata's own dedup_pair_histogram: the driver corpus's
    near-dup pairs concentrate in the J∈[0.9,1.0) 3-gram-Jaccard
    decile (241 of 256 pairs at sf0.1) with few exact groups (8),
    which scattered word substitution cannot reproduce (one
    substituted word already drops 3-gram J to ~0.89) but prefix
    truncation does (J = (L'−2)/(L−2)).

    ``vocab_size=None`` uses the testdata's CLOSED 31-word vocab
    (matched distribution). Pass an explicit size for the OPEN-vocab
    variant (words w0..w{V-1}): with a closed vocab, relative-df-
    capped operators (sim_sparse_cosine_pairs) see every term's df
    grow ∝ n — posting self-joins go quadratic as a DATA property;
    an open vocab sized per Heaps' law (V ∝ n^0.6) is how natural
    corpora behave and what the df-cap bound assumes."""
    df = spark.range(n_docs)
    did = F.col("id")
    n_base = max(1, int(n_docs * base_frac))

    def u(salt: int) -> Column:
        return (
            F.pmod(F.xxhash64(did, F.lit(seed + salt)), F.lit(1_000_000)) + 0.5
        ) / 1_000_000.0

    is_dup = (u(1) < dup_rate) & (did >= F.lit(n_base))
    src = F.when(
        is_dup, F.pmod(F.xxhash64(did, F.lit(seed + 2)), F.lit(n_base))
    ).otherwise(did)
    lu = (
        F.pmod(F.xxhash64(src, F.lit(seed + 3)), F.lit(1_000_000)) + 0.5
    ) / 1_000_000.0
    src_words = F.lit(10) + F.floor(lu * 91)
    # Truncation factor: 1.0 for originals and the 3% exact-copy
    # share; ~U(0.92, 0.99) for near-dups (see docstring).
    trunc = (
        F.when(~is_dup | (u(4) < 0.03), F.lit(1.0))
        .otherwise(F.lit(0.92) + 0.07 * u(10))
    )
    n_words = F.greatest(F.lit(10), F.floor(src_words * trunc)).cast("int")
    if vocab_size is None:
        # Body words are uniform over the 30 COMMON vocab words; the
        # 31st ('dup') is a trailing MARKER appended to near-dup docs
        # only — measured on the driver corpus (250 docs carry 'dup',
        # always exactly once, always the last word), and
        # load-bearing: the marker bigrams ('<word> dup', df ~10) are
        # most of what survives a relative df-cap, so without this
        # structure sim_sparse_cosine_pairs' kept-term set degenerates
        # to the binomial tail of common bigrams and the pair yield
        # explodes 1000x (measured 43907 and 287943 vs the real 36
        # under two wrong marker placements).
        common = [w for w in DOC_VOCAB if w != "dup"]
        varr = F.array(*[F.lit(w) for w in common])
        nv = len(common)

        def word_at(key: Column, i: Column, salt: int) -> Column:
            return F.element_at(
                varr,
                (F.pmod(F.xxhash64(key, i, F.lit(seed + salt)), F.lit(nv)) + 1).cast(
                    "int"
                ),
            )

    else:
        # Open vocab: word identity derived directly from the hash —
        # no literal array (vocab_size can be thousands). Zipf-ish
        # skew via pow on the uniform, matching the closed vocab's
        # non-uniform empirical mass.
        def word_at(key: Column, i: Column, salt: int) -> Column:
            uu = (
                F.pmod(F.xxhash64(key, i, F.lit(seed + salt)), F.lit(1_000_000))
                + 0.5
            ) / 1_000_000.0
            return F.concat(
                F.lit("w"), F.floor(F.pow(uu, 1.5) * vocab_size).cast("string")
            )

    # Word i comes from the SOURCE doc — dups share the base prefix —
    # and near-dups get the trailing 'dup' marker (see above; in the
    # open-vocab variant the marker is the same literal so the
    # df-capped structure carries over).
    words = F.transform(
        F.sequence(F.lit(1), n_words), lambda i: word_at(src, i, 5)
    )
    text = F.array_join(words, " ")
    text = F.when(is_dup, F.concat(text, F.lit(" dup"))).otherwise(text)
    return df.select(
        did.alias("doc_id"),
        text.alias("text"),
        _pick(u(8), DOC_LANGS, DOC_LANG_W).alias("lang"),
        F.concat(F.lit("src"), F.floor(u(9) * 20).cast("int").cast("string")).alias(
            "source"
        ),
        F.length(text).cast("long").alias("n_chars"),
    )


def embeddings(
    spark: SparkSession, n_vecs: int, dim: int = 64, seed: int = 42
) -> DataFrame:
    """embeddings-shaped corpus (vec_id, embedding float[], label):
    iid-gaussian components (Box-Muller from two hash uniforms),
    L2-normalized — which is exactly what the testdata is (no label
    clustering; pairwise cosine ~N(0, 1/dim), so P(cos >= 0.45) at
    dim=64 is ~1.6e-4, reproducing the testdata's near-dup yield
    without any engineered planting). Labels uniform 0..9."""
    df = spark.range(n_vecs)
    vid = F.col("id")

    def comp(i: Column) -> Column:
        u1 = (
            F.pmod(F.xxhash64(vid, i, F.lit(seed + 20)), F.lit(1_000_000)) + 0.5
        ) / 1_000_000.0
        u2 = (
            F.pmod(F.xxhash64(vid, i, F.lit(seed + 21)), F.lit(1_000_000)) + 0.5
        ) / 1_000_000.0
        return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * 3.141592653589793 * u2)

    raw = F.transform(F.sequence(F.lit(1), F.lit(dim)), comp)
    nrm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
    return df.select(
        vid.alias("vec_id"),
        F.transform(raw, lambda x: (x / nrm).cast("float")).alias("embedding"),
        F.pmod(F.xxhash64(vid, F.lit(seed + 22)), F.lit(10)).cast("int").alias("label"),
    )


# The driver fixture's exact part-name vocabulary (8 adjectives x
# 8 nouns = 64 names, 7-12 chars), measured at every SF.
PART_ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
PART_NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]


def part_like(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    adj_vocab: int | None = None,
) -> DataFrame:
    """part-shaped corpus (full fixture schema) matching the driver
    testdata's name law: p_name = '<adj> <noun>' from the fixture's
    own 8x8 closed vocabulary, p_brand uniform over Brand#1..25
    (measured: 25 brands x 8 first tokens = 200 blocks at every SF,
    near-uniform occupancy, names 7-12 chars). Under that law the
    (brand, first-token) block key of j_fuzzy_name_match has FIXED
    cardinality, so per-block size grows ∝ n and the blocked pair
    join is quadratic AS A DATA PROPERTY — the closed-vocab regime.

    ``adj_vocab=V`` switches the first token to an open vocabulary
    (a0000..a{V-1}, 5 chars — inside the fixture's 4-5 char adjective
    band): size V ∝ n to hold per-block occupancy constant, the
    natural-catalog regime where entity-name vocabulary grows with
    the catalog (the openvocab counterpoint discipline)."""
    df = spark.range(n_rows).withColumn("_s", F.xxhash64("id", F.lit(seed + 30)))
    s = F.col("_s")
    if adj_vocab is None:
        adj = _pick(_u(s, 1), PART_ADJS)
    else:
        adj = F.concat(
            F.lit("a"),
            F.lpad(F.floor(_u(s, 1) * adj_vocab).cast("int").cast("string"), 4, "0"),
        )
    name = F.concat(adj, F.lit(" "), _pick(_u(s, 2), PART_NOUNS))
    return df.select(
        F.col("id").alias("p_partkey"),
        name.alias("p_name"),
        F.concat(
            F.lit("Brand#"), (F.floor(_u(s, 3) * 25).cast("int") + 1).cast("string")
        ).alias("p_brand"),
        _pick(_u(s, 4), ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]).alias(
            "p_type"
        ),
        (F.floor(_u(s, 5) * 50).cast("int") + 1).alias("p_size"),
        F.round(_u(s, 6) * 999.0 + 1.0, 2).alias("p_retailprice"),
    )


def orders_customer_like(
    spark: SparkSession, n_orders: int, seed: int = 42
) -> dict[str, DataFrame]:
    """orders+customer-shaped corpora matching the driver fixture's
    own cross-SF law (measured on the testdata: sf0.01 = 1500
    customers / 15k orders, sf0.1 = 15000 / 150k — customers ∝ n at
    EXACTLY ~10 orders per customer): c_custkey dense 0..N-1,
    c_nationkey uniform over 25, c_mktsegment uniform over the 5
    TPC-H segments, c_acctbal uniform [-1000, 10000) at 2 dp;
    o_orderdate a TIMESTAMP uniform over 2400 daily values
    (1995-01-01 .. 2001-07-27; the driver fixture's own domain is
    2405 values ending 2001-08-01 — ADVICE r10 — the 5-day clip is
    immaterial to the 7-distinct-years QI law the governance audits
    depend on, and the cached oc corpora were measured on this law),
    o_orderpriority uniform over the 5 ordered strings. The QI-class
    cardinality of the governance audits (nation x segment x
    balance-band x year) is therefore DOMAIN-BOUNDED (~8750) at
    every scale while class occupancy grows ∝ n — the regime their
    domain-shrinking aggregation trees assume."""
    n_cust = max(1, n_orders // 10)
    cust = spark.range(n_cust).withColumn(
        "_s", F.xxhash64("id", F.lit(seed + 60))
    )
    sc = F.col("_s")
    customer = cust.select(
        F.col("id").alias("c_custkey"),
        F.concat(
            F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")
        ).alias("c_name"),
        F.floor(_u(sc, 1) * 25).cast("int").alias("c_nationkey"),
        F.round(_u(sc, 2) * 11000.0 - 1000.0, 2).alias("c_acctbal"),
        _pick(
            _u(sc, 3),
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
        ).alias("c_mktsegment"),
    )
    ordf = spark.range(n_orders).withColumn(
        "_s", F.xxhash64("id", F.lit(seed + 61))
    )
    so = F.col("_s")
    orders = ordf.select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.col("id"), F.lit(n_cust)).cast("long").alias("o_custkey"),
        _pick(_u(so, 1), ["O", "F", "P"]).alias("o_orderstatus"),
        F.round(_u(so, 2) * 150000.0 + 1000.0, 2).alias("o_totalprice"),
        (
            F.lit("1995-01-01 00:00:00").cast("timestamp")
            + F.make_interval(days=F.floor(_u(so, 3) * 2400).cast("int"))
        ).alias("o_orderdate"),
        _pick(
            _u(so, 4),
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        ).alias("o_orderpriority"),
    )
    return {"orders": orders, "customer": customer}


def compute_probes(df: DataFrame, date_col: str, distinct_cols: list[str]) -> dict:
    """Ground-truth probes (FIXTURES.md §5, clickhouse/queries.sql):
    row count, date range, distinct cardinalities — one aggregate pass."""
    aggs = [
        F.count("*").alias("n_rows"),
        F.min(date_col).alias("min_date"),
        F.max(date_col).alias("max_date"),
    ] + [F.countDistinct(c).alias(f"n_{c}") for c in distinct_cols]
    row = df.agg(*aggs).head()
    return row.asDict()


def events_like(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    k_domain: int = 100,
) -> DataFrame:
    """events-shaped corpus matching the driver testdata's events
    schema (event_id, ts, user_id, event_type, value, props) and its
    cross-SF scaling law, measured on the fixture itself: USER COUNT
    scales with n at a constant ~66 events/user (sf0.01: 150 users /
    10k rows; sf0.1: 1500 / 100k — per-user load is the invariant),
    ts uniform over one month (2024-01), event_type uniform over the
    5 fixture types, value ~ Exp(mean 50) rounded to cents (fixture
    quantiles p25/p50/p75/p90/p99 = 14.7/34.7/69/114/228 match the
    exponential to <2%), props = {"k": K}.

    ``k_domain`` controls the content-graph regime the graph entries
    derive edges from. The fixture's own domain is CLOSED (k uniform
    in [0,100) at every SF), so the transition graph saturates toward
    the complete graph on 100 nodes as n grows — wedge/label work is
    then domain-bounded, not data-bounded. Pass a scaled domain
    (k_domain ~ n/25) for the NATURAL-graph counterpoint where node
    count grows with data and average degree stays ~constant (~50):
    that is the regime the wedge fan-out bound sum(deg^2) assumes,
    and the openvocab-style second measurement for data-shape-
    sensitive graph operators (CLAUDE.md r8 lesson: measure both)."""
    df = spark.range(n_rows).withColumn("_s", F.xxhash64("id", F.lit(seed + 7)))
    s = F.col("_s")
    n_users = max(1, n_rows // 66)
    ts = F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(
        secs=F.floor(_u(s, 1) * (30 * 86400 - 60))
    )
    value = (
        F.round(-F.lit(50.0) * F.log(F.lit(1.0) - _u(s, 2)) + F.lit(0.005), 2)
    )
    return df.select(
        F.col("id").alias("event_id"),
        ts.alias("ts"),
        F.floor(_u(s, 3) * n_users).cast("long").alias("user_id"),
        _pick(_u(s, 4), ["view", "click", "purchase", "signup", "error"]).alias(
            "event_type"
        ),
        F.greatest(value, F.lit(0.01)).alias("value"),
        F.concat(
            F.lit('{"k": '),
            F.floor(_u(s, 5) * k_domain).cast("long").cast("string"),
            F.lit("}"),
        ).alias("props"),
    )

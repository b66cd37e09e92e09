"""The reference's two analytic programs as declarative Spark plans.

- ``discover_communities`` ← ``find_communities_hybrid``
  (/root/reference/app.py:31-72): three tagged sources unioned, merged
  per community (groupBy + collect_set replaces the dict-upsert at
  app.py:42-52), scored by tag weights (app.py:22-27), ranked
  (app.py:71), serialized like app.py:68.
- ``scan_signals`` ← ``find_buying_signals`` (app.py:74-151) + the
  caller's union loop (app.py:294-303): per-subreddit top-k posts,
  tombstone filters, keyword theta-join (all-matches for posts
  app.py:98, first-match-wins for comments app.py:132-142), one signal
  row per hit.

Determinism deviations from the ref (documented per SURVEY §7.4):
- Members is the dim-defined subscriber count (1000 + Σn_chars % 1e5
  per source, computed in-pass by the merge groupBy), not "first
  sighting" arrival order (A2); first-match-wins is pinned by kw_pos
  (J2); every sort ends in a unique key; tag/keyword sets serialize
  sorted.

Scale shape: the keyword/query side is broadcast (no corpus shuffle);
the only wide exchanges are the per-community aggregation and the
per-group top-k windows — both keyed on low-skew ids. The ref's
sequential per-subreddit loop (app.py:294) becomes one partitioned plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audience_finder_pro_spark.functions.text import norm_ws
from audience_finder_pro_spark.operators.keyword_match import (
    all_matches_expr,
    first_match_expr,
)
from audience_finder_pro_spark.operators.topk import top_k_per_group
from audience_finder_pro_spark.plans.views import (
    POST_TS_SPACING,
    _display_name,
    _doc_count,
    reddit_views,
)

# tag weights, ref app.py:24-26
TAG_DIRECT = "Direct Search"
TAG_POST = "Relevant Post"
TAG_COMMENT = "Relevant Comment"

# the reference's time_filter radio (app.py:256); 'all' = no window
TIME_FILTER_HOURS = {"day": 24, "week": 168, "month": 720, "year": 8760}


def _time_window_pred(spark: SparkSession, sf_dir: str, time_filter: str):
    """Time-window predicate for the synthetic post timeline, rewritten
    onto the post_id key.

    Semantics: created_ts >= as_of - window, with as_of = the timeline's
    end (epoch + n_docs·spacing). Because created_ts is monotone in
    post_id (views.POST_TS_EPOCH/POST_TS_SPACING), the predicate is
    EXACTLY post_id >= n_docs - window_seconds/spacing — a base-column
    comparison that reaches the parquet scan as a PushedFilter, where a
    raw created_ts filter on the derived column could not. The DuckDB
    oracle filters on created_ts itself, so this rewrite is
    differentially verified, not just asserted.
    """
    if time_filter not in TIME_FILTER_HOURS:
        raise ValueError(f"time_filter must be one of {[*TIME_FILTER_HOURS, 'all']}")
    n_docs = _doc_count(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    window_docs = TIME_FILTER_HOURS[time_filter] * 3600 // POST_TS_SPACING
    return F.col("post_id") >= F.lit(n_docs - window_docs)


def discover_communities(
    spark: SparkSession,
    sf_dir: str,
    queries: list[str],
    comment_limit: int = 20,
    search_time_filter: str = "all",
) -> DataFrame:
    """Ranked community table (schema per SURVEY §1.2, app.py:72).

    ``search_time_filter`` models the hardcoded time_filter="month" on the
    reference's post search (app.py:47); 'all' (default) keeps the
    declared golden query's historical shape.
    """
    v = reddit_views(spark, sf_dir)
    posts, comments = v["posts"], v["comments"]
    documents = v["documents"]
    qs = sorted(queries)  # canonical query order, ref app.py:205

    def hits(df: DataFrame, community_col: str, texts: list, tag: str) -> DataFrame:
        # J1 with a plan-time-constant query list: filter a literal array and
        # explode — the matching runs as a projection inside codegen, no join
        qarr = F.array(*[F.lit(q) for q in qs])

        def any_contains(q):
            pred = None
            for t in texts:
                c = F.contains(F.lower(t), F.lower(q))
                pred = c if pred is None else (pred | c)
            return pred

        return df.select(
            F.col(community_col).alias("community"),
            F.explode(F.filter(qarr, any_contains)).alias("query"),
            F.lit(tag).alias("found_via"),
            F.lit(None).cast("long").alias("n_chars"),
        )

    # Source 1 — direct name search (app.py:39-43), u_ filter (app.py:41).
    # Matched against the per-document display name, NOT the aggregated
    # subreddits dim: the name is a pure function of `source`, duplicates
    # collapse in the collect_set merge below, and skipping the dim saves
    # the groupBy(source) exchange the dim's build would pay.
    direct = hits(
        documents.select(_display_name("source").alias("name")).filter(
            ~F.col("name").startswith("u_")
        ),
        "name",
        [F.col("name")],
        TAG_DIRECT,
    )

    # Source 2 — post text search (app.py:47-52), u_/NSFW filters (app.py:49)
    searched = posts
    if search_time_filter != "all":
        searched = searched.filter(_time_window_pred(spark, sf_dir, search_time_filter))
    post_hits = hits(
        searched.filter(~F.col("over18")).filter(~F.col("subreddit").startswith("u_")),
        "subreddit",
        [norm_ws("title"), norm_ws("selftext")],
        TAG_POST,
    )

    # Source 3 — sampled comments (app.py:55-59): first `comment_limit`
    # comments per post by position; existential semantics (ref breaks on
    # first hit) fall out of collect_set dedup in the merge below.
    sampled = top_k_per_group(
        comments, ["post_id"], [F.col("pos").asc(), F.col("comment_id").asc()], comment_limit
    )
    comment_hits = hits(
        sampled.join(posts.select("post_id", "subreddit", "over18"), "post_id")
        .filter(~F.col("over18"))
        .filter(~F.col("subreddit").startswith("u_")),
        "subreddit",
        [norm_ws("body")],
        TAG_COMMENT,
    )

    # Fourth leg: the members (subscriber-count) input rides the SAME union
    # instead of a post-merge dim join — subscribers = 1000 + Σn_chars %
    # 100000 per source (subreddits_view), so carrying raw n_chars per doc
    # into the community groupBy computes it in-pass. This plus the
    # dim-free direct leg drops both groupBy(source) exchanges the r5 plan
    # paid (5 → 3: comment top-k window, community merge, final sort).
    members_leg = documents.select(
        _display_name("source").alias("community"),
        F.lit(None).cast("string").alias("query"),
        F.lit(None).cast("string").alias("found_via"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )

    tagged = (
        direct.unionByName(post_hits)
        .unionByName(comment_hits)
        .unionByName(members_leg)
    )

    # J4/A1/A6: merge by community; score = Σ distinct-tag weights
    # (app.py:22-27). collect_set ignores the members leg's null tags;
    # communities with no actual hit (members-leg rows only) are dropped
    # by the tags-nonempty filter, reproducing the old inner-hit semantics.
    merged = tagged.groupBy("community").agg(
        F.array_sort(F.collect_set("found_via")).alias("tags"),
        F.array_join(F.array_sort(F.collect_set("found_via")), ", ").alias("found_via"),
        F.array_join(F.array_sort(F.collect_set("query")), ", ").alias("found_by_keywords"),
        (F.lit(1000) + F.sum("n_chars") % 100000).cast("long").alias("subscribers"),
    ).filter(F.size("tags") > 0)
    score = (
        F.when(F.array_contains("tags", TAG_DIRECT), 1).otherwise(0)
        + F.when(F.array_contains("tags", TAG_POST), 2).otherwise(0)
        + F.when(F.array_contains("tags", TAG_COMMENT), 3).otherwise(0)
    )

    out = (
        merged
        .select(
            F.concat(F.lit("r/"), F.col("community")).alias("community"),
            score.cast("int").alias("relevance_score"),
            F.col("found_via"),
            F.col("found_by_keywords"),
            F.col("subscribers").alias("members"),
            F.concat(F.lit("https://www.reddit.com/r/"), F.col("community")).alias("community_link"),
            F.concat(F.lit("https://www.reddit.com/r/"), F.col("community"), F.lit("/top/?t=month")).alias(
                "top_posts_link"
            ),
        )
        .orderBy(F.desc("relevance_score"), F.desc("members"), F.asc("community"))
    )
    return out


def scan_signals(
    spark: SparkSession,
    sf_dir: str,
    subreddits: list[str],
    keywords: list[str],
    post_limit: int = 50,
    comment_limit: int = 100,
    time_filter: str = "all",
) -> DataFrame:
    """Signal rows (Subreddit, Match, Type, Text, Author, Link) — app.py:100-141.

    ``time_filter`` reproduces subreddit.top(time_filter=...) at app.py:83:
    only posts created inside the window compete for the top-k slots.
    """
    v = reddit_views(spark, sf_dir)
    posts, comments = v["posts"], v["comments"]

    # normalize 'r/' prefixes in the input list (app.py:296)
    wanted = [s.replace("r/", "") for s in subreddits]

    scoped = posts.filter(F.col("subreddit").isin(wanted))
    if time_filter != "all":
        scoped = scoped.filter(_time_window_pred(spark, sf_dir, time_filter))

    # S3/W1: top-k posts per subreddit by score (app.py:83), deterministic tiebreak
    top_posts = top_k_per_group(
        scoped,
        ["subreddit"],
        [F.col("score").desc(), F.col("post_id").asc()],
        post_limit,
    )

    # The keyword list is a plan-time constant (the ref's UI-entered list),
    # so J1/J2/A3 collapse to projection expressions — zero extra shuffles;
    # the table-valued operators (keyword_theta_join & co) cover the
    # dynamic-keyword case elsewhere.

    # post path: tombstone filter (app.py:93), all-matches set (app.py:98,102)
    live_posts = top_posts.filter(
        F.col("author").isNotNull() & (F.col("author") != "[deleted]")
    ).withColumn("content", norm_ws(F.concat_ws(" ", "title", "selftext")))
    post_signals = (
        live_posts.withColumn("matched", all_matches_expr(F.col("content"), keywords))
        .filter(F.col("matched") != "")
        .select(
            F.col("subreddit").alias("signal_subreddit"),
            F.col("matched"),
            F.lit("Post").alias("signal_type"),
            norm_ws("title").alias("signal_text"),
            F.col("author"),
            F.col("permalink").alias("link"),
            F.col("post_id").alias("src_id"),
        )
    )

    # comment path: first `comment_limit` per top post (app.py:115-116),
    # tombstone/empty filters (app.py:121-129), first-match-wins (app.py:132-142)
    sampled = top_k_per_group(
        comments.join(top_posts.select("post_id", "subreddit"), "post_id"),
        ["post_id"],
        [F.col("pos").asc(), F.col("comment_id").asc()],
        comment_limit,
    )
    live_comments = (
        sampled.filter(F.col("author").isNotNull() & (F.col("author") != "[deleted]"))
        .filter(~F.col("body").isin("[deleted]", "[removed]"))
        .withColumn("norm_body", norm_ws("body"))
        .filter(F.length("norm_body") > 0)
    )
    comment_signals = (
        live_comments.withColumn("matched", first_match_expr(F.col("norm_body"), keywords))
        .filter(F.col("matched").isNotNull())
        .select(
            F.col("subreddit").alias("signal_subreddit"),
            F.col("matched"),
            F.lit("Comment").alias("signal_type"),
            F.col("norm_body").alias("signal_text"),
            F.col("author"),
            F.col("permalink").alias("link"),
            F.col("comment_id").alias("src_id"),
        )
    )

    # U1 + deterministic total order
    return post_signals.unionByName(comment_signals).orderBy(
        "signal_subreddit", "signal_type", "src_id"
    )

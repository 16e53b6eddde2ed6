"""Sessionization — batch gaps-and-islands + stateful streaming twins.

Batch: classic lag/cumsum session assignment (the W4 window pattern applied
to time instead of space). Streaming: the same semantics through
`applyInPandasWithState` (the custom-stateful-operator route SURVEY §2.10
names for operators Spark lacks natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionize_batch(events: DataFrame) -> DataFrame:
    """(user_id, session_no, n_events, start_us, end_us) — a new session
    starts when the gap to the previous event exceeds SESSION_GAP_US."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("__us", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    marked = (
        events.withColumn("__us", us)
        .withColumn("__prev", F.lag("__us").over(w))
        .withColumn(
            "__new",
            (F.col("__prev").isNull())
            | ((F.col("__us") - F.col("__prev")) > SESSION_GAP_US),
        )
        .withColumn("session_no", F.sum(F.col("__new").cast("int")).over(wc))
    )
    return marked.groupBy(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("session_no").cast("bigint").alias("session_no"),
    ).agg(
        F.count("*").alias("n_events"),
        F.min("__us").alias("start_us"),
        F.max("__us").alias("end_us"),
    )


SESSION_ORACLE_SQL = f"""
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, event_id, epoch_us(ts) AS us
  FROM events),
marked AS (
  SELECT user_id, us, event_id,
         CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                   IS NULL THEN 1
              WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                   > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_s
  FROM e),
sess AS (
  SELECT user_id, us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(us) AS start_us, MAX(us) AS end_us
FROM sess GROUP BY user_id, session_no
"""


def sessionize_stream(spark, events_dir: str, schema) -> DataFrame:
    """Stateful-streaming twin via applyInPandasWithState: per-user state
    carries (last_ts, session_no); emits one row per closed batch-window
    per user/session. Used by tests with the memory sink."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id bigint, session_no bigint, n_events bigint, "
        "start_us bigint, end_us bigint"
    )
    state_schema = "last_us bigint, session_no bigint"

    def fn(key, pdfs, state: GroupState):
        rows = []
        last_us, session_no = (
            state.get if state.exists else (None, 0)
        )
        # concat ALL Arrow chunks of the micro-batch BEFORE sorting: a
        # user's events may straddle chunks, and per-chunk sorting would
        # process them out of global time order (last_us going backwards
        # diverges from the batch twin)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for r in pdf.itertuples():
                cur = int(r.ts.value // 1000)  # pandas ns → µs
                if last_us is None or cur - last_us > SESSION_GAP_US:
                    session_no += 1
                rows.append((int(key[0]), session_no, cur))
                last_us = cur
        state.update((last_us, session_no))
        if not rows:
            return iter([])
        df = pd.DataFrame(rows, columns=["user_id", "session_no", "us"])
        agg = df.groupby(["user_id", "session_no"], as_index=False).agg(
            n_events=("us", "size"), start_us=("us", "min"), end_us=("us", "max")
        )
        return iter([agg])

    return (
        spark.readStream.schema(schema).parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def dedup_stream(spark, docs_dir: str, schema, gap_minutes: int = 60) -> DataFrame:
    """Streaming exact-dedup twin (the pipeline's dropDuplicates face):
    documents arrive as files, each keyed by md5(text); duplicates within
    the watermark window are dropped, so the sink holds one row per
    distinct content hash (first arrival wins — the streaming analog of
    the batch keeper rule; the batch twin keeps min doc_id instead, the
    surviving HASH SET is identical)."""
    stream = (
        spark.readStream.schema(schema).parquet(docs_dir)
        .withColumn("text_hash", F.md5(F.col("text").cast("binary")))
        .withColumn("__ts", F.current_timestamp())
        .withWatermark("__ts", f"{gap_minutes} minutes")
    )
    return stream.dropDuplicatesWithinWatermark(["text_hash"])


def sessionize_stream_tws(spark, events_dir: str, schema) -> DataFrame:
    """Sessionization through Spark 4's transformWithStateInPandas — the
    successor stateful API (StatefulProcessor + typed ValueState) to
    applyInPandasWithState. Same semantics as sessionize_stream; kept as a
    twin so both custom-stateful-operator surfaces stay exercised."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = (
        "user_id bigint, session_no bigint, n_events bigint, "
        "start_us bigint, end_us bigint"
    )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "sess", "last_us bigint, session_no bigint"
            )

        def handleInputRows(self, key, rows, timer_values):
            st = self._st.get() if self._st.exists() else None
            last_us, session_no = (st[0], st[1]) if st else (None, 0)
            chunks = [pdf for pdf in rows if len(pdf)]
            out = []
            if chunks:
                pdf = pd.concat(chunks, ignore_index=True).sort_values(
                    ["ts", "event_id"]
                )
                recs = []
                for r in pdf.itertuples():
                    cur = int(r.ts.value // 1000)
                    if last_us is None or cur - last_us > SESSION_GAP_US:
                        session_no += 1
                    recs.append((int(key[0]), session_no, cur))
                    last_us = cur
                df = pd.DataFrame(recs, columns=["user_id", "session_no", "us"])
                out.append(
                    df.groupby(["user_id", "session_no"], as_index=False).agg(
                        n_events=("us", "size"),
                        start_us=("us", "min"),
                        end_us=("us", "max"),
                    )
                )
            self._st.update((last_us, session_no))
            return iter(out)

        def close(self) -> None:
            pass

    return (
        spark.readStream.schema(schema).parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="none",
        )
    )

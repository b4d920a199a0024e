package graft.operators

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark 4's `transformWithState` — the arbitrary-state API that
  * replaces `mapGroupsWithState` (typed state handles with optional TTL,
  * timers, initial state, and schema-evolvable state encoding). One
  * production-shaped processor proves the surface end to end: per-key
  * running totals held in a single `ValueState`, updated per micro-batch
  * and emitted in Update mode.
  *
  * Notes that matter at scale, learned from the API contract:
  *  - `transformWithState` REQUIRES the RocksDB state-store provider
  *    (the HDFS-backed map provider refuses the operator) — callers
  *    scope `spark.sql.streaming.stateStore.providerClass` around the
  *    query; this is also the provider you actually want for large
  *    state (incremental, constant-memory checkpoints).
  *  - The cents-integer accumulator keeps the emitted totals exact and
  *    order-independent, so the single-batch fixture run hash-matches a
  *    relational oracle (the streaming-vs-batch determinism discipline
  *    used across the `s_*` lane).
  */
object TransformState {
  case class EventIn(user_id: Long, event_id: Long, cents: Long)
  case class AggState(n: Long, cents: Long, minId: Long)
  case class UserTotals(user_id: Long, n_events: Long, cents_sum: Long, min_event: Long)

  class UserTotalsProcessor extends StatefulProcessor[Long, EventIn, UserTotals] {
    @transient private var st: ValueState[AggState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AggState]("totals",
        Encoders.product[AggState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
                                 timerValues: TimerValues): Iterator[UserTotals] = {
      var s = if (st.exists()) st.get() else AggState(0L, 0L, Long.MaxValue)
      rows.foreach { r =>
        s = AggState(s.n + 1L, s.cents + r.cents, math.min(s.minId, r.event_id))
      }
      st.update(s)
      Iterator.single(UserTotals(key, s.n, s.cents, s.minId))
    }
  }

  case class TypedEvent(user_id: Long, event_id: Long, event_type: String)
  case class UserProfile(user_id: Long, n_types: Long, n_events: Long,
                         top_type: String, low5_sum: Long)

  /** Composite-state processor: a `MapState` (per-type counters — the
    * per-key sub-keyed aggregation shape that a `ValueState` of a map
    * would rewrite wholesale on every update, where `MapState` updates
    * one RocksDB key) plus a BOUNDED `ListState` holding the 5 smallest
    * event ids seen. Every emitted field is a pure function of the SET
    * of events seen so far — no arrival-order or batch-boundary
    * dependence — so the last emission per key hash-matches a
    * relational oracle however the input is micro-batched
    * (`s_map_state` stages the input as 4 files, 1 per trigger).
    */
  class UserTypeProfileProcessor extends StatefulProcessor[Long, TypedEvent, UserProfile] {
    @transient private var types: MapState[String, Long] = _
    @transient private var low5: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      types = getHandle.getMapState[String, Long]("types",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      low5 = getHandle.getListState[Long]("low5", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
                                 timerValues: TimerValues): Iterator[UserProfile] = {
      var ids = low5.get().toSeq
      rows.foreach { r =>
        val cur = if (types.containsKey(r.event_type)) types.getValue(r.event_type) else 0L
        types.updateValue(r.event_type, cur + 1L)
        ids = (ids :+ r.event_id).sorted.take(5)
      }
      low5.put(ids.toArray)
      val entries = types.iterator().toSeq
      val (topType, _) = entries.map { case (t, n) => (t, n) }
        .minBy { case (t, n) => (-n, t) }
      Iterator.single(UserProfile(key, entries.size.toLong,
        entries.map(_._2).sum, topType, ids.sum))
    }
  }

  case class TypeEvent(event_type: String, user_id: Long)
  case class TypeDistinct(event_type: String, n_users: Long)

  /** Sketch-in-state composition: the exact-distinct bitmap
    * (`graft.functions.BitmapUtil`) held per key in a `ValueState` of
    * its serialized bytes. Streaming distinct usually means either
    * unbounded per-key dedup state (one state row per (key, user)) or
    * an approximate HLL; the paged bitmap is a third point — EXACT,
    * with state bounded by the id space (8 KiB per 65,536 ids),
    * updated in place per micro-batch. The emitted cardinality is a
    * pure function of the set of users seen, so the final emission per
    * key hash-matches COUNT(DISTINCT) however the input is batched.
    */
  class TypeDistinctBitmapProcessor
      extends StatefulProcessor[String, TypeEvent, TypeDistinct] {
    @transient private var bm: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bm = getHandle.getValueState[Array[Byte]]("bm", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TypeEvent],
                                 timerValues: TimerValues): Iterator[TypeDistinct] = {
      import graft.functions.BitmapUtil
      val pages = if (bm.exists()) BitmapUtil.fromBytes(bm.get()) else BitmapUtil.newPages()
      rows.foreach(r => BitmapUtil.add(pages, r.user_id))
      bm.update(BitmapUtil.toBytes(pages))
      Iterator.single(TypeDistinct(key, BitmapUtil.cardinality(pages)))
    }
  }

  case class CodedEvent(user_id: Long, ts_us: Long, event_id: Long, code: String)
  case class PatternOut(user_id: Long, n_events: Long, n_funnel: Long,
                        n_direct: Long, signup_to_buy: Long)

  /** Streaming CEP: the q_pattern_match regex-funnel counts maintained
    * incrementally per user. State is the user's (ts, event_id, code)
    * history held SORTED in a ListState; each batch splices its rows in
    * and re-counts the funnel regexes over the coded string — so every
    * emission is a pure function of the events seen (arrival order and
    * batch boundaries cannot matter), and the final emission per user
    * hash-matches the batch operator's oracle. State is bounded by the
    * user's history length; a production stream bounds it further with
    * a time window or TTL — the fixture's point is the semantics.
    */
  class PatternMatchProcessor extends StatefulProcessor[Long, CodedEvent, PatternOut] {
    @transient private var hist: ListState[CodedEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getListState[CodedEvent]("hist",
        Encoders.product[CodedEvent], TTLConfig.NONE)

    private val funnel = java.util.regex.Pattern.compile("v[ce]*p")
    private val direct = java.util.regex.Pattern.compile("vp")
    private val signup = java.util.regex.Pattern.compile("s.*p")

    private def countOf(p: java.util.regex.Pattern, s: String): Long = {
      val m = p.matcher(s)
      var n = 0L
      while (m.find()) n += 1
      n
    }

    override def handleInputRows(key: Long, rows: Iterator[CodedEvent],
                                 timerValues: TimerValues): Iterator[PatternOut] = {
      val all = (hist.get().toSeq ++ rows).sortBy(e => (e.ts_us, e.event_id))
      hist.put(all.toArray)
      val seq = all.map(_.code).mkString
      Iterator.single(PatternOut(key, seq.length.toLong,
        countOf(funnel, seq), countOf(direct, seq), countOf(signup, seq)))
    }
  }

  case class DocEvent(user_id: Long, event_type: String, cents: Long)
  case class DocState(n: Long, cents: Long, types: Map[String, Long], reconJson: String)
  case class DocDiffOut(user_id: Long, n_events: Long, doc: String,
                        recon: String, patch: String)

  /** Streaming CDC over a semi-structured per-key document: each
    * micro-batch updates the key's JSON profile and emits
    * `variant_diff(previous, current)` — the change-feed a downstream
    * consumer re-applies with `variant_merge_patch`. The processor ALSO
    * maintains the consumer's view: a second state field folds every
    * emitted patch onto an empty document, so "the patch stream
    * reconstructs the state" is not a spec-only property — the
    * reconstructed view is emitted next to the directly-built document
    * and the driver's oracle requires the two strings to be equal
    * (it emits the analytically-built document for BOTH columns).
    *
    * Determinism under arbitrary micro-batching: each PATCH depends on
    * where the batch boundaries fall, but the document and the folded
    * reconstruction are pure functions of the event set seen, so the
    * final emission per key is batch-split-invariant (the s_* lane's
    * discipline). Documents are built in canonical form (sorted keys,
    * compact, integer values) — exactly variant_to_json's output format
    * — so the fold's canonical re-encode cannot drift from the
    * directly-built string.
    */
  class VariantCdcProcessor extends StatefulProcessor[Long, DocEvent, DocDiffOut] {
    @transient private var st: ValueState[DocState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[DocState]("doc",
        Encoders.product[DocState], TTLConfig.NONE)

    private def docJson(n: Long, cents: Long, types: Map[String, Long]): String = {
      val t = types.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      s"""{"cents":$cents,"n":$n,"t":$t}"""
    }

    override def handleInputRows(key: Long, rows: Iterator[DocEvent],
                                 timerValues: TimerValues): Iterator[DocDiffOut] = {
      import graft.functions.VariantMergePatch._
      import graft.variant.VariantJsonCodec
      def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      def json(v: VNode): String = {
        val row = encode(v)
        VariantJsonCodec.toJsonString(row.getBinary(0), row.getBinary(1))
      }
      val hasPrev = st.exists()
      val prev = if (hasPrev) st.get() else DocState(0L, 0L, Map.empty, "{}")
      var n = prev.n; var cents = prev.cents; var types = prev.types
      rows.foreach { r =>
        n += 1L; cents += r.cents
        types = types.updated(r.event_type, types.getOrElse(r.event_type, 0L) + 1L)
      }
      val prevDoc = if (hasPrev) docJson(prev.n, prev.cents, prev.types) else "{}"
      val newDoc = docJson(n, cents, types)
      val patch = diff(docToVNode(utf8(prevDoc)), docToVNode(utf8(newDoc)))
      val recon = merge(docToVNode(utf8(prev.reconJson)), patch)
      val reconJson = json(recon)
      st.update(DocState(n, cents, types, reconJson))
      Iterator.single(DocDiffOut(key, n, newDoc, reconJson, json(patch)))
    }
  }
}

package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors, ThreadFactory}
import scala.util.control.NonFatal

/** Async query lifecycle + result-reuse cache (reference §3.1 transposed).
  *
  * The reference submits `SELECT {fields} FROM {t} WHERE species='{v}' AND
  * {condition}` to Athena and returns a query id immediately; clients poll
  * status and fetch the materialized CSV result (`app/main.py:427-503`).
  * Here the same contract runs on Spark: submit builds the declarative
  * plan, a driver-side pool executes `df.write.csv` under a job group
  * (= the query id, so CANCELLED maps to `cancelJobGroup`), and a state
  * registry tracks QUEUED → RUNNING → SUCCEEDED | FAILED | CANCELLED.
  *
  * Result reuse: the reference canonicalized the SQL text (lowercase
  * unquoted tokens + sort condition tokens, `app/main.py:78-86`) — which
  * collides distinct queries sharing a token multiset (`a=1 AND b=2` vs
  * `a=2 AND b=1`). We key on Catalyst's canonicalized analyzed plan
  * instead: strictly sound (same semantics ⇒ same key) and it still
  * honors the reference's AND-commutativity reuse. TTL matches the
  * reference's 44 days by default; entries are evicted lazily on probe.
  *
  * Scale: results are written partition-parallel (no `coalesce(1)` on the
  * hot path — a 100 TB extract must not serialize through one task);
  * single-file delivery is the exporters' job, which stream via
  * `toLocalIterator`.
  */
object QueryService {
  sealed trait State
  case object Queued extends State
  case object Running extends State
  case object Succeeded extends State
  final case class Failed(error: String) extends State
  case object Cancelled extends State

  final case class Status(queryId: String, state: State, resultPath: Option[String],
                          expiresAtMillis: Option[Long] = None)

  /** Reference query-id validation (`app/main.py:70-76`): 36 chars, 4
    * hyphens — the UUID shape. */
  def isValidQueryId(id: String): Boolean =
    id.length == 36 && id.count(_ == '-') == 4

  val DefaultCacheTtlMillis: Long = 3801600L * 1000 // 44 days, app/main.py:488

  /** Result delivery expiry (A18): the reference presigns the result URL
    * for 3600s at poll time (`app/main.py:272`, `app/constants.py:16`). */
  val ResultTtlMillis: Long = 3600L * 1000
}

final class QueryService(
    spark: SparkSession,
    catalog: Catalog,
    resultDir: String,
    cacheTtlMillis: Long = QueryService.DefaultCacheTtlMillis,
    clock: () => Long = () => System.currentTimeMillis(),
    poolSize: Int = 4
) extends AutoCloseable {
  import QueryService._

  private val states = new ConcurrentHashMap[String, State]()
  // semanticHash of the canonicalized analyzed plan -> (queryId, insertedAt)
  private val planCache = new ConcurrentHashMap[Int, (String, Long)]()
  loadRegistry() // query ids + reuse cache survive a restart (Redis role)
  private val pool = Executors.newFixedThreadPool(poolSize, new ThreadFactory {
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, "graft-query"); t.setDaemon(true); t
    }
  })

  def resultPath(queryId: String): String = s"$resultDir/$queryId"

  /** Submit the reference's query shape; returns immediately with a query
    * id (cache hit returns the prior id without re-execution). */
  def submit(dataType: String, partitionColumn: String, partitionValue: String,
             fields: String = "*", condition: Option[String] = None): String =
    // Dataset analysis is eager (Spark 4): a bad column/syntax in
    // `condition` throws right here, so the build is inside the same
    // guard that turns plan errors into an async FAILED query.
    try submitPlan(QueryBuilder.build(catalog.table(dataType), partitionColumn,
      partitionValue, fields, condition))
    catch { case NonFatal(e) => failedQuery(e) }

  private def failedQuery(e: Throwable): String = {
    val queryId = UUID.randomUUID().toString
    states.put(queryId, Failed(String.valueOf(e.getMessage)))
    queryId
  }

  /** Submit an arbitrary DataFrame as an async query (the engine surface
    * is wider than the reference's single shape — Layer C). */
  def submitPlan(df: DataFrame): String = {
    // Analysis errors (bad column, bad syntax deep in `condition`) surface
    // through the async status, like an Athena FAILED execution — the
    // submit endpoint itself stays non-throwing for plan bugs.
    val key = try df.queryExecution.analyzed.canonicalized.semanticHash() catch {
      case NonFatal(e) => return failedQuery(e)
    }
    val now = clock()
    val cached = planCache.get(key)
    if (cached != null && now - cached._2 < cacheTtlMillis
        && states.get(cached._1) != null
        && !states.get(cached._1).isInstanceOf[Failed]
        && states.get(cached._1) != Cancelled) {
      return cached._1
    }
    val queryId = UUID.randomUUID().toString
    states.put(queryId, Queued)
    planCache.put(key, (queryId, now))
    pool.submit(new Runnable {
      def run(): Unit = {
        if (states.get(queryId) == Cancelled) return
        states.put(queryId, Running)
        try {
          spark.sparkContext.setJobGroup(queryId, s"graft query $queryId",
            interruptOnCancel = true)
          df.write.option("header", "true").mode("overwrite")
            .csv(resultPath(queryId))
          states.put(queryId, Succeeded)
        } catch {
          case NonFatal(e) =>
            if (states.get(queryId) == Cancelled) () // cancel wins
            else states.put(queryId, Failed(String.valueOf(e.getMessage)))
        } finally spark.sparkContext.clearJobGroup()
      }
    })
    queryId
  }

  /** Poll status (the reference's `GET /query/{id}/status`, `app/main.py:
    * 234-277`): state + result location once SUCCEEDED. */
  def status(queryId: String): Option[Status] = {
    if (!isValidQueryId(queryId)) return None
    Option(states.get(queryId)).map { st =>
      // expiry is stamped at poll time, like the reference presigning a
      // fresh 3600s URL on every status call
      Status(queryId, st,
        if (st == Succeeded) Some(resultPath(queryId)) else None,
        if (st == Succeeded) Some(clock() + ResultTtlMillis) else None)
    }
  }

  /** CANCELLED state via Spark job-group cancellation. */
  def cancel(queryId: String): Boolean =
    Option(states.get(queryId)) match {
      case Some(Queued) | Some(Running) =>
        states.put(queryId, Cancelled)
        spark.sparkContext.cancelJobGroup(queryId)
        true
      case _ => false
    }

  /** Preview (`app/main.py:361-424`): first `maxResults` rows of a
    * finished result **including the header as row 0**, every cell a
    * string (Athena's VarCharValue semantics). maxResults ∈ [1, 1000],
    * default 26 (= header + 25 data rows). */
  def preview(queryId: String, maxResults: Int = 26): Either[String, Seq[Seq[String]]] = {
    if (!isValidQueryId(queryId)) return Left(s"invalid query id: $queryId")
    if (maxResults < 1 || maxResults > 1000)
      return Left("maxResults must be within [1, 1000]")
    Option(states.get(queryId)) match {
      case None => Left(s"unknown query id: $queryId")
      case Some(Succeeded) =>
        val df = spark.read.option("header", "true").csv(resultPath(queryId))
        val header = df.columns.toSeq
        val rows = df.limit(maxResults - 1).collect().toSeq
          .map(_.toSeq.map(v => if (v == null) "" else String.valueOf(v)))
        Right(header +: rows)
      case Some(st) => Left(s"query not finished: $st")
    }
  }

  /** Test/ops hook: block until the query leaves QUEUED/RUNNING. */
  def await(queryId: String, timeoutMillis: Long = 120000): State = {
    val deadline = System.currentTimeMillis() + timeoutMillis
    while (System.currentTimeMillis() < deadline) {
      states.get(queryId) match {
        case Queued | Running => Thread.sleep(20)
        case other if other != null => return other
        case _ => throw new NoSuchElementException(queryId)
      }
    }
    throw new java.util.concurrent.TimeoutException(queryId)
  }

  // ── durable registry (reference role: Redis, `app/redis_setup.py:1-6`,
  //    shared by workers and surviving API restarts, `app/main.py:472-488`).
  //    Here: a TSV snapshot in the result dir, written on close and loaded
  //    on construction, so a client polling a query id after an engine
  //    restart still gets status instead of "unknown query id". ──────────

  private def registryPath = java.nio.file.Paths.get(resultDir, "_registry.tsv")

  private def loadRegistry(): Unit = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(registryPath)) return
    java.nio.file.Files.readAllLines(registryPath).asScala.foreach { line =>
      line.split("\t", -1) match {
        case Array("S", id, name, err) =>
          val st = name match {
            case "SUCCEEDED" => Succeeded
            case "CANCELLED" => Cancelled
            case _ => Failed(new String(
              java.util.Base64.getDecoder.decode(err), "UTF-8"))
          }
          states.put(id, st)
        case Array("C", key, id, at) => planCache.put(key.toInt, (id, at.toLong))
        case _ => ()
      }
    }
  }

  private def persistRegistry(): Unit = {
    val b64 = (s: String) =>
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    val sb = new StringBuilder
    states.forEach { (id, st) =>
      // a query still in flight at shutdown cannot resume (its Spark job
      // died with the JVM): snapshot it as FAILED, honestly
      val (name, err) = st match {
        case Succeeded => ("SUCCEEDED", "")
        case Cancelled => ("CANCELLED", "")
        case Failed(e) => ("FAILED", b64(String.valueOf(e)))
        case Queued | Running => ("FAILED", b64("interrupted by engine restart"))
      }
      sb.append(s"S\t$id\t$name\t$err\n")
    }
    planCache.forEach { (k, v) => sb.append(s"C\t$k\t${v._1}\t${v._2}\n") }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(resultDir))
    java.nio.file.Files.write(registryPath, sb.toString.getBytes("UTF-8"))
  }

  def close(): Unit = {
    pool.shutdown()
    persistRegistry()
  }
}

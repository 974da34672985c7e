package graft.streaming

/** Per-sink connector configuration (SURVEY.md §2.1 S5). The reference
  * keys one API token per app id from the environment
  * (`/root/reference/routes/makeRouter.js:14-18`) and fails any request
  * whose app has no token (`:21-24`); its ingest caps request bodies at
  * 5 MB (`/root/reference/server.js:11`). Here the same surface is a
  * typed config object — per-app credentials plus reader/writer option
  * maps (`maxFilesPerTrigger` for backpressure, `checkpointLocation` for
  * exactly-once restart) — configuration only, no network code: the
  * credential map rides along to whatever connector a deployment plugs
  * into `foreachBatch`.
  *
  * @param appId              logical sink identity (the reference's app id)
  * @param credentials        e.g. "apiToken" -> ... (resolution failure
  *                           mirrors the reference's thrown error)
  * @param readerOptions      applied to the streaming reader — e.g.
  *                           `maxFilesPerTrigger` (backpressure: bound the
  *                           files admitted per micro-batch, the analogue
  *                           of the reference's 5 MB body cap)
  * @param checkpointLocation offset/commit log directory; with the
  *                           batchId-guarded [[IdempotentMerge]] this
  *                           yields exactly-once state updates across
  *                           restarts
  */
final case class SinkConfig(
    appId: String = "default",
    credentials: Map[String, String] = Map.empty,
    readerOptions: Map[String, String] = Map.empty,
    checkpointLocation: Option[String] = None) {

  /** The per-app auth token; absent → the reference's error, verbatim
    * semantics (`makeRouter.js:21-24`).
    */
  def token: String = credentials.getOrElse("apiToken",
    throw new NoSuchElementException(s"No API token found for app ID $appId"))
}

object SinkConfig {

  /** Environment-style per-app registry (the reference's `API_TOKENS`
    * map): look up the sink config for the app a webhook route targets.
    */
  final class Registry private[SinkConfig] (configs: Map[String, SinkConfig]) {
    def get(appId: String): Option[SinkConfig] = configs.get(appId)
    def apply(appId: String): SinkConfig = configs.getOrElse(appId,
      throw new NoSuchElementException(s"No API token found for app ID $appId"))
  }

  def registry(configs: SinkConfig*): Registry =
    new Registry(configs.map(c => c.appId -> c).toMap)
}

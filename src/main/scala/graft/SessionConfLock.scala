package graft

/** JVM-wide serialization point for SCOPED session-conf overrides
  * (r11 concurrency audit). Spark session conf is session-scoped by
  * design: an operator that must set a conf for its duration (the
  * bounded streaming runners pin `spark.sql.shuffle.partitions` to
  * the state-store count at stream START — there is no per-query
  * override for it) cannot do set → run → restore safely while other
  * conf-scoped operators interleave on the same session: the restore
  * writes back a stale value and one of the runners executes under
  * the other's width.
  *
  * Holding this lock across the whole scope makes concurrent
  * conf-scoped runners SERIALIZE (correct, and acceptable — they are
  * bounded drain-to-memory harness runners; a production deployment
  * starts long-lived streams once at boot). Conf-NEUTRAL queries are
  * unaffected and run fully concurrently (ConcurrencySpec); an
  * unrelated query that happens to plan a batch shuffle while a
  * runner holds its override will see the runner's width — inherent
  * to Spark's session-scoped conf, and the documented isolation
  * escape is one `spark.newSession()` per concurrent track (shared
  * context, cache, and catalog; independent conf). */
object SessionConfLock

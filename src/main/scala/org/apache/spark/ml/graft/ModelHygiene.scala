package org.apache.spark.ml.graft

import org.apache.spark.ml.util.HasTrainingSummary

/** Serving hygiene for freshly-fitted models (package bridge — the
  * summary setter is `private[ml]`).
  *
  * A fitted model's training summary holds its `predictions` frame and
  * through it the live SparkSession. That is fine on the driver, but
  * model-serving closures (`model.transform`'s predict UDF) serialize
  * the model object — and the session is serializable ONLY while its
  * `observationManager` lazy field is still uninitialized. The first
  * `Dataset.observe` on the session (graft's d6 convergence metric)
  * initializes it, and from then on every serve of a summary-carrying
  * model dies with `NotSerializableException: ObservationManager`.
  *
  * Serving needs coefficients, not training diagnostics, so graft
  * drops the summary at fit time: closures shrink and the serve path
  * stops depending on which queries ran earlier in the session.
  * (Models reloaded from disk never carry a summary — this makes the
  * fit path match them.)
  */
object ModelHygiene {
  /** Drop the training summary; returns the same model for chaining. */
  def dropTrainingSummary[M <: HasTrainingSummary[_]](m: M): M = {
    m.setSummary(None)
    m
  }
}

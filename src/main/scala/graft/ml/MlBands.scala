package graft.ml

/** Fit-quality bands for the oracle-checkable GBT verdict rows (m12, lab2).
  *
  * A seeded model fit is deterministic but not DuckDB-recomputable, so the
  * queries emit booleans "metric within band" instead of raw metrics (the
  * a7b/a13b sketch-verification pattern). Bands are RELATIVE to the
  * validation target mean so one constant serves every scale factor.
  *
  * Calibration (graft.GbtBandProbe at sf0.01, the correctness-gate point,
  * Spark 4.1.2 GBT seed 42): m12 mae/ȳ 0.0222, rmse/ȳ 0.0274, r² 0.9977;
  * lab2 mae/ȳ 0.0309, rmse/ȳ 0.0363, r² 0.9959. Ceilings sit ~3-4× the
  * measured point: loose enough that seed or library drift can't flip them
  * spuriously, tight enough that a fit that stopped learning (the mean
  * predictor reads mae/ȳ ≈ 0.35, r² = 0 on this target) fails all three.
  * Re-run GbtBandProbe and re-pin whenever the fit pipeline changes.
  */
object MlBands {
  val MaeRelCeil = 0.10
  val RmseRelCeil = 0.12
  val R2Floor = 0.95
}

/- Regenerated security-parameter certificate (lambda-snark-tpu;
   analysis: docs/security_analysis.md §5). Every `example` is a
   kernel-checked arithmetic fact about the SHIPPED defaults. -/

private def friLogBlowup : ℕ := 3
private def friNumQueries : ℕ := 30
private def friFinalLen : ℕ := 64
private def conjecturedProximityBits : ℕ := friLogBlowup * friNumQueries
private def targetProximityBits : ℕ := 80

/-- Default profile meets the conjectured-regime proximity target. -/
example : targetProximityBits ≤ conjecturedProximityBits := by decide

private def zkMaskLen : ℕ := 68
private def maskLenCap : ℕ := 4096

/-- The ZK mask covers every revealed position: 2 per query (paired
    leaves) plus the out-of-domain evaluation slots. -/
example : 2 * friNumQueries + 8 ≤ zkMaskLen := by decide
example : zkMaskLen ≤ maskLenCap := by decide

private def goldilocksQ : ℕ := 18446744069414584321
private def q45 : ℕ := 17592169062401
private def healthcareQ : ℕ := 2013265921
private def maxAggregateStatements : ℕ := 4096
private def dMaxEnvelope : ℕ := 16384

/-- Kind-8 λ-batching loss ≤ 2⁻³⁰ over the full wire envelope:
    (8·S_max)·d_max / q ≤ 2⁻³⁰ (docs/security_analysis.md §3). -/
example : 8 * maxAggregateStatements * dMaxEnvelope * 2 ^ 30 ≤ goldilocksQ := by decide

/-- Registered 2-adic subgroup orders divide q − 1 (the root-ladder
    facts every coset argument relies on; proof/fri.py registry). -/
example : 2 ^ 32 ∣ (goldilocksQ - 1) := by decide
example : 2 ^ 13 ∣ (q45 - 1) := by decide
example : 2 ^ 27 ∣ (healthcareQ - 1) := by decide

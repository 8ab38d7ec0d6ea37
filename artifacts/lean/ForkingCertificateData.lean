/- Regenerated forking-certificate example data (lambda-snark-tpu;
   reference: formal/tests/ForkingCertificateExample.lean). -/

def trivialSparseMatrix : SparseMatrix (ZMod 2) where
  nRows := 1
  nCols := 1
  entries := []

def trivialR1CS : R1CS (ZMod 2) where
  nVars := 1
  nCons := 1
  nPub := 0
  A := trivialSparseMatrix
  B := trivialSparseMatrix
  C := trivialSparseMatrix
  h_dim_A := by simp [trivialSparseMatrix]
  h_dim_B := by simp [trivialSparseMatrix]
  h_dim_C := by simp [trivialSparseMatrix]
  h_pub_le := by decide

-- fork point: transcript alphas [0, 1]

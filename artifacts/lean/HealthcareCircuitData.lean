/- Regenerated certificate data (lambda-snark-tpu; reference
   format: formal/tests/HealthcareCircuit.lean). -/

private def q : ℕ := 2013265921

@[simp] abbrev HealthcareField : Type := ZMod q

noncomputable def healthcareMatrixA : SparseMatrix HealthcareField :=
  { nRows := 10
    nCols := 10
    entries :=
      [ (0, 5, 1)
      , (1, 6, 1)
      , (2, 7, 1)
      , (3, 5, 1)
      , (4, 8, 1)
      , (5, 0, 1)
      , (5, 9, (2 : HealthcareField))
      ] }

noncomputable def healthcareMatrixB : SparseMatrix HealthcareField :=
  { nRows := 10
    nCols := 10
    entries :=
      [ (0, 0, (-1 : HealthcareField))
      , (0, 5, 1)
      , (1, 0, (-1 : HealthcareField))
      , (1, 6, 1)
      , (2, 0, (-1 : HealthcareField))
      , (2, 7, 1)
      , (3, 6, 1)
      , (4, 7, 1)
      , (5, 0, 1)
      ] }

noncomputable def healthcareMatrixC : SparseMatrix HealthcareField :=
  { nRows := 10
    nCols := 10
    entries :=
      [ (3, 8, 1)
      , (4, 9, 1)
      , (5, 1, 1)
      ] }

noncomputable def healthcareR1CS : R1CS HealthcareField :=
  { nVars := 10
    nCons := 10
    nPub := 2
    A := healthcareMatrixA
    B := healthcareMatrixB
    C := healthcareMatrixC
    h_dim_A := by constructor <;> decide
    h_dim_B := by constructor <;> decide
    h_dim_C := by constructor <;> decide
    h_pub_le := by decide }

noncomputable def healthcareWitness : Witness HealthcareField healthcareR1CS.nVars
  | ⟨0, _⟩ => 1
  | ⟨1, _⟩ => 3
  | ⟨2, _⟩ => 142
  | ⟨3, _⟩ => 45
  | ⟨4, _⟩ => 31
  | ⟨5, _⟩ => 1
  | ⟨6, _⟩ => 1
  | ⟨7, _⟩ => 1
  | ⟨8, _⟩ => 1
  | ⟨9, _⟩ => 1

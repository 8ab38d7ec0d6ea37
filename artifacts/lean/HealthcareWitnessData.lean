/- Regenerated witness-data certificate (lambda-snark-tpu; reference
   derivations: formal/tests/HealthcareWitnessData.lean). Explicit
   values for the vectors the reference defines by derivation;
   healthcareOmega = 31^((q-1)/10)
   = 1403701133 (least primitive root of q = 2013265921). -/

noncomputable def healthcareWitnessVector : Vector HealthcareField healthcareR1CS.nVars :=
  ⟨[1, 3, 142, 45, 31, 1, 1, 1, 1, 1], by decide⟩

noncomputable def healthcarePublicVector : Vector HealthcareField healthcareR1CS.nPub :=
  ⟨[1, 3], by decide⟩

noncomputable def healthcareDomainVector : Vector HealthcareField healthcareR1CS.nVars :=
  ⟨[1, 1403701133, 645581151, 1198229788, 1956349769, 2013265920, 609564788, 1367684770, 815036133, 56916152], by decide⟩

noncomputable def healthcareConstraintResiduals : Vector HealthcareField healthcareR1CS.nCons :=
  ⟨[0, 0, 0, 0, 0, 0, 0, 0, 0, 0], by decide⟩

"""r1cs subpackage of lambda_snark_tpu."""

"""lean subpackage of lambda_snark_tpu."""

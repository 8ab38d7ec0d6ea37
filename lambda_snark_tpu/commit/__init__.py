"""commit subpackage of lambda_snark_tpu."""

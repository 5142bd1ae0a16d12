from pulpo_tpu.uq.predict import predict_with_uncertainty, UQResult  # noqa: F401

from pulpo_tpu.eval import flow_viz, metrics, tables, artifact, visualize  # noqa: F401
from pulpo_tpu.eval.evaluator import Evaluate  # noqa: F401

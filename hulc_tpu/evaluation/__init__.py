from hulc_tpu.evaluation.lh_eval import evaluate_policy, get_sequences  # noqa: F401
from hulc_tpu.evaluation.policy import HulcPolicy  # noqa: F401
from hulc_tpu.evaluation.tasks import ALL_TASKS, SceneObsTasks  # noqa: F401

from .harness import Evaluator  # noqa: F401

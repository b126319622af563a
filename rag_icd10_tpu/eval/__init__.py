from .retrieval import build_eval_set, evaluate, EvalTier  # noqa: F401

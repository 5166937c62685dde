from gossipnet_tpu.eval.cocoeval import COCOEvaluator, EvalImage  # noqa: F401

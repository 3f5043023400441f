from duet_tpu.eval.evaluate import EvalResult, evaluate_files, evaluate_callsets

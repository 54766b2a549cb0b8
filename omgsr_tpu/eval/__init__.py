from omgsr_tpu.eval.probes import (  # noqa: F401
    create_linear_input,
    extract_features,
    knn_classify,
    logistic_regression,
    make_eval_transform,
    sweep_logreg_C,
    train_linear_probes,
)

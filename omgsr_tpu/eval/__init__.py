from omgsr_tpu.eval.probes import (  # noqa: F401
    create_linear_input,
    extract_features,
    imagenet_c_mce,
    knn_classify,
    logistic_regression,
    make_eval_transform,
    sweep_logreg_C,
    top_k_accuracy,
    train_linear_probes,
)

# heavier task suites stay import-on-demand:
#   eval.depth        — DPT depther (make_depther, port_dpt_state)
#   eval.dinotxt      — CLIP-style text alignment (DINOTxt, clip_loss)
#   eval.segmentation — Mask2Former (make_segmentor, slide_inference)
#   eval.detection    — Plain-DETR (plain_detr_apply, detr_postprocess)

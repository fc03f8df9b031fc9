"""Command-line entry points, mirroring the reference's scripts:

  format-dataset    <- format_effocr_recognizer_dataset.py
  train-recognizer  <- train_effocr_recognizer.py
  train-localizer   <- train_effocr_localizer_d2.py
  infer             <- infer_effocr_onnx_multi.py / infer_effocr.py
  viz               <- viz_effocr_recognizer.py
  import-trocr      <- scripts/trocr_fairseq_to_pytorch_chkpt.py + trocr/infer_trocr.py
  coco-split/combine/subset <- scripts/coco_*.py

Run as `python -m effocr_tpu <command> ...`.
"""

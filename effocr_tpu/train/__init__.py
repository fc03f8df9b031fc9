from effocr_tpu.train.losses import supcon_loss, cross_entropy_loss, yolo_loss

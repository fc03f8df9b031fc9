from effocr_tpu.retrieval.index import PrototypeIndex

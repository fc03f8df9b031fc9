from effocr_tpu.baselines.seq2seq import (
    CharTokenizer,
    Seq2SeqOCR,
    make_seq2seq_train_step,
    greedy_decode,
)

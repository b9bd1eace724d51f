from gctplus_tpu.sample.decode import DecodeEngine, top_k_filter_probs

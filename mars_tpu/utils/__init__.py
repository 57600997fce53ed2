from mars_tpu.utils import evaluation

from mars_tpu.pipeline import pir, vva, vta, filtering

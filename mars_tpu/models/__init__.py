from mars_tpu.models import layers, dinov2, clip, sam, convert

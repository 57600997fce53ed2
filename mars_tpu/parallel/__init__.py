from mars_tpu.parallel import mesh, train

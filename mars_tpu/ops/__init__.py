from mars_tpu.ops import components, emd, assignment, nms, kmeans

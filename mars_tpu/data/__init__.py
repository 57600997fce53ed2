from mars_tpu.data.base import EpisodeRecord, to_device_episode
from mars_tpu.data.registry import build_dataset

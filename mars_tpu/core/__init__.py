from mars_tpu.core.episode import Episode, Proposals
from mars_tpu.core import imaging, masks

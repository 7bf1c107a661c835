from nerf_tpu.models.proposal import ProposalNetwork
from nerf_tpu.models.vanilla import VanillaNeRF
from nerf_tpu.models.refnerf import RefNeRF

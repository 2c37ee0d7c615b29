"""qldpc_tpu — TPU-native framework for circuit-level Monte-Carlo simulation
and decoding of quantum LDPC (bivariate-bicycle) codes.

Built from scratch for JAX/XLA/Pallas on TPU with the capabilities of the
reference `michelebanfi/qLDPC-branched-off` (see SURVEY.md): BB code
construction, depth-8 syndrome-extraction circuits, circuit-level
depolarizing noise, fault-equivalence-class decoding matrices, batched
normalized min-sum BP with OSD fallback, alpha/beta calibration, and
sharded Monte-Carlo logical-error-rate sweeps.
"""
__version__ = "0.1.0"

from .models.bb import BBCode, CODE_REGISTRY, get_code
from .models.circuit import SyndromeCircuit
from .models.builder import build_decoding_matrices, channel_llrs


def __getattr__(name):
    # Lazy: importing the decode stack pulls in jax; keep bare
    # `import qldpc_tpu` cheap for matrix-only consumers.
    if name == "BatchDecoder":
        from .parallel.decoder import BatchDecoder
        return BatchDecoder
    if name == "run_simulation":
        from .parallel.engine import run_simulation
        return run_simulation
    raise AttributeError(name)

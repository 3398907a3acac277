"""gmat-tpu: TPU-native genomic multivariate analysis (REMMAX) framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
GMAT package (see SURVEY.md): PLINK IO, genomic relationship matrices,
multi-GRM weighted EM+AI REML, single-SNP and exhaustive/approximate
epistasis score tests, and longitudinal (random-regression) GWAS — sharded
over TPU meshes.
"""
from gmat_tpu import config  # noqa: F401  -- sets the x64 policy first

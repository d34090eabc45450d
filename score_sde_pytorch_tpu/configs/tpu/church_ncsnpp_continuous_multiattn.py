"""LSUN church NCSN++ (cont. VE) with MULTI-RESOLUTION attention (16, 32).

Beyond-reference TPU-native variant of ve/church_ncsnpp_continuous.py: the
reference caps attention at 16x16 because its dense O((HW)^2) logits
materialization is the memory wall (reference models/layerspp.py:82-86,
attn_resolutions=(16,) in every shipped config). Here the 32x32 grid
(N=1024, C=256) routes to the Pallas flash-attention kernel
(ops/attention.py: O(N*C) live memory, logits never hit HBM), making
large-grid attention a drivable config axis rather than a latent extension
point. Measured e2e on v5e in PARITY.md (tools/flash_e2e.py).
"""
from score_sde_pytorch_tpu.configs.builder import declare

get_config = declare(
    'lsun',
    training=dict(sde='vesde', continuous=True),
    sampling=dict(method='pc', predictor='reverse_diffusion', corrector='langevin'),
    data=dict(category='church_outdoor'),
    model=dict(name='ncsnpp', normalization='GroupNorm', nonlinearity='swish', nf=128, attn_resolutions=(16, 32), resamp_with_conv=True, conditional=True, fir_kernel=[1, 3, 3, 1], skip_rescale=True, resblock_type='biggan', progressive_combine='sum', attention_type='ddpm', conv_size=3, scale_by_sigma=True, ema_rate=0.999, ch_mult=(1, 1, 2, 2, 2, 2, 2), num_res_blocks=2, fir=True, progressive='output_skip', progressive_input='input_skip', init_scale=0., fourier_scale=16, remat=True, sigma_max=380),
)

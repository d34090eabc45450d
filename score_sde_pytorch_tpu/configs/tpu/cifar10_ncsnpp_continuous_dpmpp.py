"""Flagship CIFAR-10 NCSN++ (cont. VE) with the DPM-Solver++(2M) sampler.

Beyond-reference TPU-native variant of ve/cifar10_ncsnpp_continuous.py: the
reference samples with a 2000-NFE PC chain (reference sampling.py:355-411);
here snapshot/eval sampling uses the 1-NFE-per-step multistep prob-flow
solver (sampling.get_dpmpp_sampler) at 20 steps — measured 268 samples/s/chip
on v5e vs 3.97 for the PC chain (tools/fast_sampler_bench.py, PARITY.md).
Training hyperparameters are identical to the flagship config.
"""
from score_sde_pytorch_tpu.configs.builder import declare

get_config = declare(
    'cifar10',
    training=dict(sde='vesde', continuous=True),
    sampling=dict(method='dpmpp', dpmpp_steps=20, predictor='reverse_diffusion', corrector='langevin'),
    model=dict(name='ncsnpp', normalization='GroupNorm', nonlinearity='swish', nf=128, attn_resolutions=(16,), resamp_with_conv=True, conditional=True, fir_kernel=[1, 3, 3, 1], skip_rescale=True, resblock_type='biggan', progressive_combine='sum', attention_type='ddpm', conv_size=3, scale_by_sigma=True, ema_rate=0.999, ch_mult=(1, 2, 2, 2), num_res_blocks=4, fir=True, progressive='none', progressive_input='residual', init_scale=0., fourier_scale=16),
)

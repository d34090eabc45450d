"""LSUN church 256px NCSN++ (cont. VE) with measured single-chip TPU defaults.

TPU-shipping variant of ve/church_ncsnpp_continuous.py (reference
configs/ve/church_ncsnpp_continuous.py): same architecture/SDE hyperparams,
plus the settings measured on v5e (tools/highres_feasibility.py, PARITY.md):
bf16 compute (fp32 params/norm stats), full remat, batch 32 → 460 ms/step on
ONE chip. ``spatial_sharding=True`` turns on the in-model H-axis sharding
constraints for (data, space) meshes — exercised by the driver's
``dryrun_multichip`` 256px case; on a single chip it is a no-op.
"""
from score_sde_pytorch_tpu.configs.builder import declare

get_config = declare(
    'lsun',
    training=dict(sde='vesde', continuous=True, batch_size=32),
    sampling=dict(method='pc', predictor='reverse_diffusion',
                  corrector='langevin'),
    data=dict(category='church_outdoor'),
    model=dict(name='ncsnpp', normalization='GroupNorm',
               nonlinearity='swish', nf=128, attn_resolutions=(16,),
               resamp_with_conv=True, conditional=True,
               fir_kernel=[1, 3, 3, 1], skip_rescale=True,
               resblock_type='biggan', progressive_combine='sum',
               attention_type='ddpm', conv_size=3, scale_by_sigma=True,
               ema_rate=0.999, ch_mult=(1, 1, 2, 2, 2, 2, 2),
               num_res_blocks=2, fir=True, progressive='output_skip',
               progressive_input='input_skip', init_scale=0.,
               fourier_scale=16, sigma_max=380,
               dtype='bfloat16', remat=True, spatial_sharding=True),
)

"""CelebA-HQ 1024px NCSN++ (cont. VE) with measured TPU defaults.

TPU-shipping variant of ve/celebahq_ncsnpp_continuous.py (reference
configs/ve/celebahq_ncsnpp_continuous.py:59-77 — nf=16, 8-level ch_mult
pyramid, global batch 8 on 4x V100-32GB). Measured on v5e
(tools/highres_feasibility.py, PARITY.md): with bf16 + full remat, batch 2
fits ONE chip at 496 ms/step, so the reference's global batch 8 needs 4
chips (vs 4x 32GB GPUs) and an 8-chip v5e runs batch 16 at the same
per-chip cost. ``spatial_sharding=True`` enables H-axis activation sharding
over the mesh's space axis for memory headroom beyond batch-only sharding.
"""
from score_sde_pytorch_tpu.configs.builder import declare

get_config = declare(
    'lsun',
    training=dict(sde='vesde', continuous=True, batch_size=8,
                  reduce_mean=False),
    sampling=dict(method='pc', predictor='reverse_diffusion',
                  corrector='langevin', snr=0.15),
    eval=dict(batch_size=8, begin_ckpt=1, end_ckpt=96),
    data=dict(dataset='CelebAHQ', image_size=1024, tfrecords_path=''),
    model=dict(name='ncsnpp', normalization='GroupNorm',
               nonlinearity='swish', nf=16, attn_resolutions=(16,),
               resamp_with_conv=True, conditional=True,
               fir_kernel=[1, 3, 3, 1], skip_rescale=True,
               resblock_type='biggan', progressive_combine='sum',
               attention_type='ddpm', conv_size=3, scale_by_sigma=True,
               sigma_max=1348, num_scales=2000, ema_rate=0.9999,
               sigma_min=0.01, ch_mult=(1, 2, 4, 8, 16, 32, 32, 32),
               num_res_blocks=1, dropout=0., fir=True,
               progressive='output_skip', progressive_input='input_skip',
               init_scale=0., fourier_scale=16, embedding_type='fourier',
               dtype='bfloat16', remat=True, spatial_sharding=True),
)

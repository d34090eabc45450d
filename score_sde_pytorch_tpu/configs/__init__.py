"""ml_collections config files, schema-compatible with the reference's
configs/ tree (SURVEY.md §2.1): sections training/sampling/eval/data/model/
optim plus seed. `config.device` is dropped (device placement is mesh/
sharding driven); `config.mesh` describes the device mesh instead.
"""

"""Paper experiment drivers (the reference's matlab/experiments layer).

One module per experiment, each with a ``run(...)`` function returning a
plain-dict results table and a ``main()`` CLI that writes JSON artifacts to
``results/`` (the reference's .mat stage files):

- synthetic    : 3-engine RMSE comparison on a prior sample
                 (synthetic_data_experiment.m:242-253)
- missing_data : gap-filling on music, engines x ep_itts, RMSE/SNR over gaps
                 (missing_data_music.m:119-175)
- denoising    : white-noise sweep on speech, SNR vs noise level
                 (noise_reduction_speech.m:34-80)
- source_sep   : 3-note joint separation, per-source SNR
                 (source_sep_piano.m:50-227)
- textures_ihgp: long-signal (T > 100k) texture gap-filling with the
                 infinite-horizon engine (README.md:11 capacity claim,
                 train_textures.m corpus)

Defaults are scaled to finish in minutes on one chip / CPU; pass the
``--full`` flags for paper-scale runs.
"""

AUDIO_ROOT = "/root/reference/audio"

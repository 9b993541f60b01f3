from avmnist_tpu.dsp.spectrogram import (  # noqa: F401
    psd_specgram,
    render_gray_r,
    wav_to_spectrogram,
    wav_to_spectrogram_batch,
)

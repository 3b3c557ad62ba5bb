"""DSP operators — the compute library of the framework.

Each op comes in two layers:

1. a pure functional kernel over arrays (jit/shard_map-composable), and
2. a Processor allocator factory plugging it into a Line, with streaming
   state (filter tails, FFT delay lines, resampler phase) carried in the
   component state pytree and tunable parameters exposed as traced inputs
   (so live mutations never recompile).

The reference framework ships no DSP ops of its own (components like
wav.Source live out-of-tree, reference ``doc.go:30-33``); this module is the
kernel set the north-star benchmarks require (BASELINE.json configs: gain,
mix, 255-tap FIR, 44.1k->48k polyphase resample, 64k-tap overlap-save FFT
convolution reverb, EQ, demod).
"""

from pipe_tpu.ops.gain import Gain, gain_block
from pipe_tpu.ops.mix import ChannelMix, channel_mix_block
from pipe_tpu.ops.fir import FIR, fir_block, fir_init_tail, design_lowpass
from pipe_tpu.ops.resample import Resampler, polyphase_design
from pipe_tpu.ops.ols import OLSConvolve, ols_init_state, ols_block
from pipe_tpu.ops.biquad import (
    Biquad,
    biquad_block,
    design_peaking_eq,
    design_lowpass_biquad,
    design_highpass_biquad,
    design_bandpass,
    design_notch,
    design_allpass,
    design_lowshelf,
    design_highshelf,
)
from pipe_tpu.ops.demod import (
    Oscillator,
    IQMix,
    EnvelopeDetector,
    FMDiscriminator,
    am_demod_factory,
    fm_demod_factory,
)
from pipe_tpu.ops.fused import (
    BiquadCascade,
    FIRResampler,
    FIRWithGain,
    MixWithGain,
    combine_bank,
    fused_apply,
)
from pipe_tpu.ops.channelizer import (
    Channelizer,
    channelize_block,
    design_prototype,
    split_bins,
)
from pipe_tpu.ops.spectral import (
    SpectralGain,
    SpectralGate,
    design_stft_window,
    spectral_block,
    spectral_init_state,
    stft_frames,
)
from pipe_tpu.ops.dynamics import (
    Delay,
    Compressor,
    NoiseGate,
    envelope_block,
    compressor_gain,
)

__all__ = [
    "Gain",
    "gain_block",
    "ChannelMix",
    "channel_mix_block",
    "FIR",
    "fir_block",
    "fir_init_tail",
    "design_lowpass",
    "Resampler",
    "polyphase_design",
    "OLSConvolve",
    "ols_init_state",
    "ols_block",
    "Biquad",
    "biquad_block",
    "design_peaking_eq",
    "design_lowpass_biquad",
    "design_highpass_biquad",
    "design_bandpass",
    "design_notch",
    "design_allpass",
    "design_lowshelf",
    "design_highshelf",
    "Oscillator",
    "IQMix",
    "EnvelopeDetector",
    "FMDiscriminator",
    "am_demod_factory",
    "fm_demod_factory",
    "BiquadCascade",
    "FIRResampler",
    "FIRWithGain",
    "MixWithGain",
    "combine_bank",
    "fused_apply",
    "Channelizer",
    "channelize_block",
    "design_prototype",
    "split_bins",
    "SpectralGain",
    "SpectralGate",
    "design_stft_window",
    "spectral_block",
    "spectral_init_state",
    "stft_frames",
    "Delay",
    "Compressor",
    "NoiseGate",
    "envelope_block",
    "compressor_gain",
]

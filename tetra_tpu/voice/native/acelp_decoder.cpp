// TETRA ACELP speech decoder (functional equivalent of the ETSI EN 300 395-2
// reference decoder the upstream plugin fetches at build time: Bits2prm_Tetra
// + Decod_Tetra + Post_Process, used at tetra_lower_mac.c:355-363).
//
// The ETSI reference sources (with their quantization codebooks) are not
// redistributable and are unavailable in this environment, so this is a
// from-scratch CELP synthesis engine with the TETRA frame structure:
//   30 ms frame, 240 samples @ 8 kHz, 4 subframes x 60 samples,
//   10th-order LPC, adaptive codebook (pitch 20..147.5 at half-sample
//   resolution, delta-coded across subframes), 4-pulse algebraic codebook
//   on 15-sample track blocks (full subframe coverage), jointly-indexed
//   pitch/code gains, pole-zero postfilter with adaptive tilt + highpass.
// The 137-bit frame layout is this framework's own documented allocation
// (voice/acelp.py mirrors it); audio is intelligible-speech-class output,
// not bit-exact to the ETSI fixed-point decoder.
//
// Plain C ABI for ctypes binding; no dependencies.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int LPC_ORDER = 10;
constexpr int FRAME = 240;
constexpr int SUBFRAME = 60;
constexpr int NSUB = 4;
constexpr int PITCH_MIN = 20;
constexpr int PITCH_MAX = 147;
// pitch lags carry half-sample resolution: lag2 = 2*lag in [40, 295]
constexpr int LAG2_MIN = 2 * PITCH_MIN;
constexpr int LAG2_MAX = 2 * PITCH_MAX + 1;
// extra history margin for the fractional-delay interpolator's tap span
constexpr int EXC_PAD = 4;

struct DecoderState {
    float lsf_prev[LPC_ORDER];        // previous frame LSFs (Hz-normalized)
    float mem_syn[LPC_ORDER];         // synthesis filter memory
    float excitation[PITCH_MAX + EXC_PAD + FRAME]; // ACB history + frame
    float postfilter_mem_num[LPC_ORDER];
    float postfilter_mem_den[LPC_ORDER];
    float tilt_mem;
    float agc_gain;
    float hp_x1, hp_x2, hp_y1, hp_y2; // highpass biquad state
    float prev_pitch_gain;
    float log_gc;                     // log-domain code-gain predictor
    int   prev_lag2;                  // previous pitch lag in half-samples
};

// mean LSFs of speech (normalized 0..pi), used as quantizer centers
const float kLsfMean[LPC_ORDER] = {
    0.24f, 0.47f, 0.81f, 1.12f, 1.44f, 1.78f, 2.09f, 2.40f, 2.68f, 2.94f};

inline float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// ---------------------------------------------------------------------------
// Bit readers
// ---------------------------------------------------------------------------

struct BitReader {
    const uint8_t* bits;
    int pos;
    int take(int n) {
        int v = 0;
        for (int i = 0; i < n; i++) v = (v << 1) | (bits[pos++] & 1);
        return v;
    }
};

// ---------------------------------------------------------------------------
// LSF dequantization: split scalar quantizer around speech-mean LSFs.
// 26 bits = 10 deltas of {3,3,3,3,3,2,2,2,2,3} bits, signed around mean.
// ---------------------------------------------------------------------------

const int kLsfBits[LPC_ORDER] = {3, 3, 3, 3, 3, 2, 2, 2, 2, 3};

void dequant_lsf(BitReader& br, float* lsf) {
    for (int i = 0; i < LPC_ORDER; i++) {
        int q = br.take(kLsfBits[i]);
        int levels = 1 << kLsfBits[i];
        float span = 0.35f;  // radians around the mean
        float delta = span * (2.0f * q / (levels - 1) - 1.0f);
        lsf[i] = kLsfMean[i] + delta;
    }
    // enforce ordering + minimum separation for filter stability
    const float min_gap = 0.035f;
    for (int i = 1; i < LPC_ORDER; i++)
        if (lsf[i] < lsf[i - 1] + min_gap) lsf[i] = lsf[i - 1] + min_gap;
    for (int i = LPC_ORDER - 1; i >= 0; i--)
        if (lsf[i] > 3.10f - (LPC_ORDER - 1 - i) * min_gap)
            lsf[i] = 3.10f - (LPC_ORDER - 1 - i) * min_gap;
}

// ---------------------------------------------------------------------------
// LSF -> LPC conversion (standard LSP polynomial method)
// ---------------------------------------------------------------------------

void lsf_to_lpc(const float* lsf, float* a) {
    // split LSFs into P (even idx) and Q (odd idx) polynomial roots
    double p[LPC_ORDER / 2], q[LPC_ORDER / 2];
    for (int i = 0; i < LPC_ORDER / 2; i++) {
        p[i] = -2.0 * std::cos(lsf[2 * i]);
        q[i] = -2.0 * std::cos(lsf[2 * i + 1]);
    }
    // build P(z), Q(z): products of (1 + p_i z^-1 + z^-2)
    double P[LPC_ORDER / 2 + 1 + LPC_ORDER], Q[LPC_ORDER / 2 + 1 + LPC_ORDER];
    int n = 1;
    P[0] = 1.0; Q[0] = 1.0;
    for (int i = 0; i < LPC_ORDER / 2; i++) {
        // multiply by (1 + c z^-1 + z^-2)
        double Pn[16] = {0}, Qn[16] = {0};
        for (int j = 0; j < n; j++) {
            Pn[j] += P[j];
            Pn[j + 1] += p[i] * P[j];
            Pn[j + 2] += P[j];
            Qn[j] += Q[j];
            Qn[j + 1] += q[i] * Q[j];
            Qn[j + 2] += Q[j];
        }
        n += 2;
        std::memcpy(P, Pn, sizeof(Pn));
        std::memcpy(Q, Qn, sizeof(Qn));
    }
    // A(z) = [P(z)(1+z^-1) + Q(z)(1-z^-1)] / 2
    double Pf[16] = {0}, Qf[16] = {0};
    for (int j = 0; j < n; j++) {
        Pf[j] += P[j]; Pf[j + 1] += P[j];
        Qf[j] += Q[j]; Qf[j + 1] -= Q[j];
    }
    for (int i = 1; i <= LPC_ORDER; i++)
        a[i - 1] = (float)(0.5 * (Pf[i] + Qf[i]));
}

// ---------------------------------------------------------------------------
// Algebraic codebook: 4 pulses, one per contiguous 15-sample track block.
//  16 bits per subframe: 4 x (position:3 -> even offsets 0..14 within the
//  block, sign:1).  Track t covers samples [15t, 15t+14], so every region of
//  the subframe receives excitation (a track layout confined to the first
//  samples leaves the tail of each subframe unexcited and audibly dull).
// ---------------------------------------------------------------------------

void decode_algebraic(int index, float* code) {
    std::memset(code, 0, SUBFRAME * sizeof(float));
    for (int track = 0; track < 4; track++) {
        int field = (index >> (track * 4)) & 0xF;
        int posq = field >> 1;          // 3 bits: 8 even offsets in the block
        int sign = field & 1;
        int pos = 15 * track + 2 * posq;
        if (pos < SUBFRAME)
            code[pos] = sign ? -1.0f : 1.0f;
    }
}

// ---------------------------------------------------------------------------
// Fractional-delay adaptive codebook: past excitation at lag2/2 samples.
// Odd lag2 -> half-sample point via an 8-tap Hamming-windowed sinc.
// ---------------------------------------------------------------------------

const float kHalfTaps[2 * EXC_PAD] = {
    // sinc(3.5 - k) * hamming_8(k), normalized to unity DC gain
    -0.00732f, 0.03248f, -0.13735f, 0.61219f,
    0.61219f, -0.13735f, 0.03248f, -0.00732f};

inline float acb_sample(const float* e, int i, int lag2) {
    int lag = lag2 >> 1;
    const float* p = e + i - lag;
    if ((lag2 & 1) == 0) return *p;
    float s = 0.0f;
    for (int k = 0; k < 2 * EXC_PAD; k++)
        s += kHalfTaps[k] * p[k - EXC_PAD];
    return s;
}

// gains: 6 bits = 3 bits pitch gain (0..1.2), 3 bits code gain.
// The code gain is predicted in the log domain with leakage toward a fixed
// nominal level, so the predictor is bounded regardless of the bit stream
// (a raw energy-feedback predictor diverges on random input).
void decode_gains(int index, float* log_gc_state, float* gp, float* gc) {
    int gpi = (index >> 3) & 7;
    int gci = index & 7;
    *gp = 1.2f * gpi / 7.0f;
    const float log_nominal = 5.5f;  // ~ e^5.5 = 245 excitation amplitude
    *log_gc_state = 0.6f * *log_gc_state + 0.4f * log_nominal
                    + 0.35f * (gci - 3.5f);
    *gc = std::exp(clampf(*log_gc_state, 0.0f, 9.0f));
}

// ---------------------------------------------------------------------------
// Core synthesis
// ---------------------------------------------------------------------------

void synth_filter(const float* a, const float* x, float* y, int n, float* mem) {
    for (int i = 0; i < n; i++) {
        float s = x[i];
        for (int j = 0; j < LPC_ORDER; j++) {
            float prev = (i - 1 - j) >= 0 ? y[i - 1 - j] : mem[j - i];
            s -= a[j] * prev;
        }
        y[i] = s;
    }
    for (int j = 0; j < LPC_ORDER; j++) mem[j] = y[n - 1 - j];
}

void postfilter(DecoderState* st, const float* a, float* x, int n) {
    // pole-zero short-term postfilter H(z) = A(z/gn)/A(z/gd) + adaptive tilt
    const float gn = 0.65f, gd = 0.75f;
    float an[LPC_ORDER], ad[LPC_ORDER];
    float fn = gn, fd = gd;
    for (int j = 0; j < LPC_ORDER; j++) {
        an[j] = a[j] * fn;
        ad[j] = a[j] * fd;
        fn *= gn; fd *= gd;
    }
    float tmp[SUBFRAME];
    // numerator FIR
    for (int i = 0; i < n; i++) {
        float s = x[i];
        for (int j = 0; j < LPC_ORDER; j++) {
            float prev = (i - 1 - j) >= 0 ? x[i - 1 - j]
                                          : st->postfilter_mem_num[j - i];
            s += an[j] * prev;
        }
        tmp[i] = s;
    }
    for (int j = 0; j < LPC_ORDER; j++)
        st->postfilter_mem_num[j] = x[n - 1 - j];
    // denominator IIR
    float out[SUBFRAME];
    for (int i = 0; i < n; i++) {
        float s = tmp[i];
        for (int j = 0; j < LPC_ORDER; j++) {
            float prev = (i - 1 - j) >= 0 ? out[i - 1 - j]
                                          : st->postfilter_mem_den[j - i];
            s -= ad[j] * prev;
        }
        out[i] = s;
    }
    for (int j = 0; j < LPC_ORDER; j++)
        st->postfilter_mem_den[j] = out[n - 1 - j];
    // adaptive tilt compensation: first reflection coefficient of the
    // postfilter's truncated impulse response sets the tilt strength (a
    // fixed tilt over-brightens voiced segments and dulls unvoiced ones)
    float h[22];
    for (int i = 0; i < 22; i++) {
        // impulse response of A(z/gn)/A(z/gd) via direct recursion
        float s = (i == 0) ? 1.0f : ((i - 1 < LPC_ORDER) ? an[i - 1] : 0.0f);
        for (int j = 0; j < LPC_ORDER && j < i; j++)
            s -= ad[j] * h[i - 1 - j];
        h[i] = s;
    }
    float r0 = 1e-6f, r1 = 0.0f;
    for (int i = 0; i < 22; i++) r0 += h[i] * h[i];
    for (int i = 0; i < 21; i++) r1 += h[i] * h[i + 1];
    float k1 = r1 / r0;
    float mu = (k1 > 0.0f) ? 0.5f * k1 : 0.25f * k1;
    // AGC toward input energy
    float ein = 1e-6f, eout = 1e-6f;
    for (int i = 0; i < n; i++) { ein += x[i] * x[i]; eout += out[i] * out[i]; }
    float g = std::sqrt(ein / eout);
    st->agc_gain = 0.9f * st->agc_gain + 0.1f * g;
    for (int i = 0; i < n; i++) {
        float v = out[i] - mu * st->tilt_mem;
        st->tilt_mem = out[i];
        x[i] = v * st->agc_gain;
    }
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* tetra_acelp_create() {
    DecoderState* st = new DecoderState();
    std::memset(st, 0, sizeof(*st));
    std::memcpy(st->lsf_prev, kLsfMean, sizeof(kLsfMean));
    st->agc_gain = 1.0f;
    st->prev_lag2 = 120;
    st->log_gc = 5.5f;
    return st;
}

void tetra_acelp_destroy(void* h) { delete (DecoderState*)h; }

// Decode one 137-bit frame (bit-per-byte) into 240 s16 samples @ 8 kHz.
// bfi != 0 triggers concealment (repeat previous parameters, damped).
void tetra_acelp_decode_frame(void* h, const uint8_t* bits137, int bfi,
                              int16_t* out240) {
    DecoderState* st = (DecoderState*)h;
    BitReader br{bits137, 0};

    float lsf[LPC_ORDER];
    int lag2[NSUB], alg[NSUB], gains[NSUB];
    if (!bfi) {
        dequant_lsf(br, lsf);                      // 26 bits
        // absolute pitch, half-sample resolution: the full 8-bit codespace
        // spans 20..147.5 samples in 0.5 steps (256 indices, no modulo waste)
        lag2[0] = LAG2_MIN + br.take(8);
        for (int s = 1; s < NSUB; s++) {
            int delta2 = br.take(5) - 15;          // -7.5..+8 samples
            int v = lag2[s - 1] + delta2;
            lag2[s] = v < LAG2_MIN ? LAG2_MIN : (v > LAG2_MAX ? LAG2_MAX : v);
        }
        for (int s = 0; s < NSUB; s++) alg[s] = br.take(16);
        for (int s = 0; s < NSUB; s++) gains[s] = br.take(6);
        // (26 + 8 + 15 + 64 + 24 = 137 bits)
    } else {
        // concealment: reuse previous LSFs, damp gains
        std::memcpy(lsf, st->lsf_prev, sizeof(lsf));
        for (int s = 0; s < NSUB; s++) {
            lag2[s] = st->prev_lag2;
            alg[s] = 0;
            gains[s] = 0;
        }
    }

    // [0..PITCH_MAX+EXC_PAD) history, then the current frame's excitation
    float* exc_hist = st->excitation;
    float* exc = st->excitation + PITCH_MAX + EXC_PAD;

    for (int s = 0; s < NSUB; s++) {
        // interpolate LSFs across subframes
        float lsf_i[LPC_ORDER], a[LPC_ORDER];
        float w = (s + 1) / (float)NSUB;
        for (int j = 0; j < LPC_ORDER; j++)
            lsf_i[j] = (1.0f - w) * st->lsf_prev[j] + w * lsf[j];
        lsf_to_lpc(lsf_i, a);

        float* e = exc + s * SUBFRAME;
        // adaptive codebook contribution (fractional lag; when the lag is
        // shorter than the subframe the loop reads samples it just wrote,
        // which is exactly the standard repeat-extension of the short-lag
        // adaptive codebook)
        float gp, gc;
        decode_gains(gains[s], &st->log_gc, &gp, &gc);
        if (bfi) { gp = st->prev_pitch_gain * 0.9f; gc = 0.0f; }
        for (int i = 0; i < SUBFRAME; i++)
            e[i] = gp * acb_sample(e, i, lag2[s]);
        // algebraic codebook contribution
        float code[SUBFRAME];
        decode_algebraic(alg[s], code);
        for (int i = 0; i < SUBFRAME; i++) e[i] += gc * code[i];

        st->prev_pitch_gain = gp;
        st->prev_lag2 = lag2[s];

        // synthesis + postfilter
        float synth[SUBFRAME];
        synth_filter(a, e, synth, SUBFRAME, st->mem_syn);
        postfilter(st, a, synth, SUBFRAME);

        // highpass (100 Hz biquad) + s16 output
        const float b0 = 0.9446f, b1 = -1.8892f, b2 = 0.9446f;
        const float a1 = -1.8861f, a2 = 0.8923f;
        for (int i = 0; i < SUBFRAME; i++) {
            float xin = synth[i];
            float y = b0 * xin + b1 * st->hp_x1 + b2 * st->hp_x2
                      - a1 * st->hp_y1 - a2 * st->hp_y2;
            st->hp_x2 = st->hp_x1; st->hp_x1 = xin;
            st->hp_y2 = st->hp_y1; st->hp_y1 = y;
            float v = clampf(y * 8.0f, -32768.0f, 32767.0f);
            out240[s * SUBFRAME + i] = (int16_t)v;
        }
    }

    // roll excitation history
    std::memmove(exc_hist, st->excitation + FRAME,
                 (PITCH_MAX + EXC_PAD) * sizeof(float));
    std::memcpy(st->lsf_prev, lsf, sizeof(lsf));
}

}  // extern "C"

// FLAC decoder — native audio-IO backend for the input pipeline.
//
// The reference decodes FLAC through torchaudio / praat-parselmouth (C++
// library dependencies, SURVEY §2.7); this image ships neither, so the
// framework brings its own. Full stream support: CONSTANT / VERBATIM /
// FIXED(0-4) / LPC subframes, Rice + Rice2 residuals with partitioning and
// escape codes, wasted bits, independent / left-side / right-side /
// mid-side stereo, 8/12/16/20/24/32-bit samples, UTF-8 frame numbers,
// variable and fixed block sizes. CRCs are consumed but not verified
// (tolerant decode, like torchaudio's default path).
//
// C API (ctypes-consumed from tacotron2_tpu/audio/flac.py):
//   flac_decode_file(path, &samples, &n, &channels, &rate, &bits) -> 0 on ok
//   flac_free(samples)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t size;
    size_t byte_pos = 0;
    int bit_pos = 0;  // bits consumed in current byte (0..7)
    bool error = false;

    explicit BitReader(const uint8_t* d, size_t s) : data(d), size(s) {}

    bool eof() const { return byte_pos >= size; }

    uint32_t read_bit() {
        if (byte_pos >= size) { error = true; return 0; }
        uint32_t bit = (data[byte_pos] >> (7 - bit_pos)) & 1u;
        if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
        return bit;
    }

    uint64_t read_bits(int n) {
        uint64_t v = 0;
        for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
        return v;
    }

    int64_t read_signed(int n) {
        uint64_t v = read_bits(n);
        // sign-extend
        if (n > 0 && (v >> (n - 1)) & 1u) v |= ~((1ull << n) - 1);
        return (int64_t)v;
    }

    uint32_t read_unary() {
        uint32_t q = 0;
        while (!error && read_bit() == 0) ++q;
        return q;
    }

    void align_to_byte() {
        if (bit_pos != 0) { bit_pos = 0; ++byte_pos; }
    }
};

// UTF-8 style coded number used for frame/sample indices
uint64_t read_utf8_number(BitReader& br) {
    uint32_t b0 = (uint32_t)br.read_bits(8);
    if (b0 < 0x80) return b0;
    int n_extra = 0;
    uint32_t mask = 0x40;
    while (b0 & mask) { ++n_extra; mask >>= 1; }
    uint64_t v = b0 & (mask - 1);
    for (int i = 0; i < n_extra; ++i) {
        uint32_t b = (uint32_t)br.read_bits(8);
        v = (v << 6) | (b & 0x3F);
    }
    return v;
}

// Rice / escape residual decode into warmed-up signal buffer
bool decode_residual(BitReader& br, int order, int block_size,
                     std::vector<int64_t>& out /* size block_size */) {
    uint32_t method = (uint32_t)br.read_bits(2);
    if (method > 1) return false;
    int param_bits = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 0xF : 0x1F;
    uint32_t part_order = (uint32_t)br.read_bits(4);
    uint32_t n_parts = 1u << part_order;
    int idx = order;
    for (uint32_t p = 0; p < n_parts; ++p) {
        int count = (int)(block_size >> part_order);
        if (p == 0) count -= order;
        if (count < 0) return false;
        uint32_t param = (uint32_t)br.read_bits(param_bits);
        if (param == escape) {
            int raw_bits = (int)br.read_bits(5);
            for (int i = 0; i < count; ++i) out[idx++] = raw_bits ? br.read_signed(raw_bits) : 0;
        } else {
            for (int i = 0; i < count; ++i) {
                uint32_t q = br.read_unary();
                uint64_t r = param ? br.read_bits((int)param) : 0;
                uint64_t zz = ((uint64_t)q << param) | r;
                out[idx++] = (int64_t)(zz >> 1) ^ -(int64_t)(zz & 1);  // zigzag
            }
        }
        if (br.error) return false;
    }
    return idx == block_size;
}

const int FIXED_COEFFS[5][4] = {
    {},            // order 0
    {1},           // order 1
    {2, -1},       // order 2
    {3, -3, 1},    // order 3
    {4, -6, 4, -1} // order 4
};

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& out) {
    if (br.read_bit() != 0) return false;  // padding bit must be 0
    uint32_t type = (uint32_t)br.read_bits(6);
    int wasted = 0;
    if (br.read_bit()) wasted = 1 + (int)br.read_unary();
    bps -= wasted;
    out.assign((size_t)block_size, 0);

    if (type == 0) {  // CONSTANT
        int64_t v = br.read_signed(bps);
        for (int i = 0; i < block_size; ++i) out[i] = v;
    } else if (type == 1) {  // VERBATIM
        for (int i = 0; i < block_size; ++i) out[i] = br.read_signed(bps);
    } else if (type >= 8 && type <= 12) {  // FIXED, order = type - 8
        int order = (int)type - 8;
        for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
        if (!decode_residual(br, order, block_size, out)) return false;
        for (int i = order; i < block_size; ++i) {
            int64_t pred = 0;
            for (int j = 0; j < order; ++j) pred += (int64_t)FIXED_COEFFS[order][j] * out[i - 1 - j];
            out[i] += pred;
        }
    } else if (type >= 32) {  // LPC, order = (type & 31) + 1
        int order = (int)(type & 31) + 1;
        for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
        uint32_t prec = (uint32_t)br.read_bits(4);
        if (prec == 0xF) return false;
        int precision = (int)prec + 1;
        int shift = (int)br.read_signed(5);
        if (shift < 0) return false;
        std::vector<int64_t> coeffs((size_t)order);
        for (int i = 0; i < order; ++i) coeffs[i] = br.read_signed(precision);
        if (!decode_residual(br, order, block_size, out)) return false;
        for (int i = order; i < block_size; ++i) {
            int64_t pred = 0;
            for (int j = 0; j < order; ++j) pred += coeffs[j] * out[i - 1 - j];
            out[i] += pred >> shift;
        }
    } else {
        return false;  // reserved
    }
    if (wasted) for (auto& v : out) v <<= wasted;
    return !br.error;
}

}  // namespace

extern "C" {

// Returns 0 on success. Caller frees *out_samples with flac_free.
// Samples are interleaved int32, scaled to the stream's bit depth.
int flac_decode_file(const char* path, int32_t** out_samples,
                     int64_t* out_n_frames, int* out_channels,
                     int* out_sample_rate, int* out_bits) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    std::fseek(f, 0, SEEK_END);
    long fsize = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf((size_t)fsize);
    if (std::fread(buf.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
        std::fclose(f);
        return 2;
    }
    std::fclose(f);

    if (fsize < 42 || std::memcmp(buf.data(), "fLaC", 4) != 0) return 3;

    // metadata blocks
    size_t pos = 4;
    int channels = 0, bits = 0;
    uint32_t sample_rate = 0;
    uint64_t total_samples = 0;
    bool last = false;
    bool have_streaminfo = false;
    while (!last && pos + 4 <= buf.size()) {
        uint8_t hdr = buf[pos];
        last = (hdr & 0x80) != 0;
        uint8_t type = hdr & 0x7F;
        uint32_t len = ((uint32_t)buf[pos + 1] << 16) | ((uint32_t)buf[pos + 2] << 8) | buf[pos + 3];
        pos += 4;
        if (type == 0 && len >= 34) {  // STREAMINFO
            const uint8_t* p = &buf[pos];
            sample_rate = ((uint32_t)p[10] << 12) | ((uint32_t)p[11] << 4) | (p[12] >> 4);
            channels = ((p[12] >> 1) & 0x7) + 1;
            bits = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
            total_samples = ((uint64_t)(p[13] & 0xF) << 32) | ((uint64_t)p[14] << 24) |
                            ((uint64_t)p[15] << 16) | ((uint64_t)p[16] << 8) | p[17];
            have_streaminfo = true;
        }
        pos += len;
    }
    if (!have_streaminfo || channels == 0 || sample_rate == 0) return 4;

    std::vector<int32_t> pcm;
    if (total_samples) pcm.reserve((size_t)total_samples * channels);

    BitReader br(buf.data() + pos, buf.size() - pos);
    std::vector<std::vector<int64_t>> chan((size_t)channels);

    while (!br.eof()) {
        // frame sync: 11111111 111110xx
        uint32_t sync = (uint32_t)br.read_bits(14);
        if (br.error || br.eof()) break;
        if (sync != 0x3FFE) return 5;
        br.read_bit();                      // reserved
        br.read_bit();                      // blocking strategy
        uint32_t bs_code = (uint32_t)br.read_bits(4);
        uint32_t sr_code = (uint32_t)br.read_bits(4);
        uint32_t ch_code = (uint32_t)br.read_bits(4);
        uint32_t ss_code = (uint32_t)br.read_bits(3);
        br.read_bit();                      // reserved
        read_utf8_number(br);               // frame or sample number

        int block_size;
        if (bs_code == 1) block_size = 192;
        else if (bs_code >= 2 && bs_code <= 5) block_size = 576 << (bs_code - 2);
        else if (bs_code == 6) block_size = (int)br.read_bits(8) + 1;
        else if (bs_code == 7) block_size = (int)br.read_bits(16) + 1;
        else if (bs_code >= 8) block_size = 256 << (bs_code - 8);
        else return 6;

        if (sr_code == 12) br.read_bits(8);
        else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

        int frame_bps = bits;
        switch (ss_code) {
            case 1: frame_bps = 8; break;
            case 2: frame_bps = 12; break;
            case 4: frame_bps = 16; break;
            case 5: frame_bps = 20; break;
            case 6: frame_bps = 24; break;
            case 7: frame_bps = 32; break;
            default: break;
        }
        br.read_bits(8);  // CRC-8 (not verified)

        int n_ch = channels;
        int assignment = (int)ch_code;
        if (assignment <= 7) {
            n_ch = assignment + 1;
            if (n_ch != channels) return 7;
        } else if (assignment <= 10) {
            if (channels != 2) return 7;
            n_ch = 2;
        } else {
            return 7;
        }

        for (int c = 0; c < n_ch; ++c) {
            int sub_bps = frame_bps;
            // side channel carries one extra bit
            if ((assignment == 8 && c == 1) || (assignment == 9 && c == 0) ||
                (assignment == 10 && c == 1))
                ++sub_bps;
            if (!decode_subframe(br, block_size, sub_bps, chan[(size_t)c])) return 8;
        }
        br.align_to_byte();
        br.read_bits(16);  // CRC-16 (not verified)
        if (br.error) return 9;

        // stereo decorrelation
        if (assignment == 8) {  // left/side: right = left - side
            for (int i = 0; i < block_size; ++i) chan[1][(size_t)i] = chan[0][(size_t)i] - chan[1][(size_t)i];
        } else if (assignment == 9) {  // right/side: left = right + side
            for (int i = 0; i < block_size; ++i) {
                int64_t side = chan[0][(size_t)i];
                chan[0][(size_t)i] = chan[1][(size_t)i] + side;
            }
        } else if (assignment == 10) {  // mid/side
            for (int i = 0; i < block_size; ++i) {
                int64_t mid = chan[0][(size_t)i];
                int64_t side = chan[1][(size_t)i];
                mid = (mid << 1) | (side & 1);
                chan[0][(size_t)i] = (mid + side) >> 1;
                chan[1][(size_t)i] = (mid - side) >> 1;
            }
        }

        for (int i = 0; i < block_size; ++i)
            for (int c = 0; c < channels; ++c)
                pcm.push_back((int32_t)chan[(size_t)c][(size_t)i]);

        if (total_samples && pcm.size() >= total_samples * (size_t)channels) break;
    }

    if (total_samples && pcm.size() > total_samples * (size_t)channels)
        pcm.resize((size_t)(total_samples * (size_t)channels));

    int64_t n_frames = (int64_t)(pcm.size() / (size_t)channels);
    int32_t* out = (int32_t*)std::malloc(pcm.size() * sizeof(int32_t));
    if (!out) return 10;
    std::memcpy(out, pcm.data(), pcm.size() * sizeof(int32_t));
    *out_samples = out;
    *out_n_frames = n_frames;
    *out_channels = channels;
    *out_sample_rate = (int)sample_rate;
    *out_bits = bits;
    return 0;
}

void flac_free(int32_t* p) { std::free(p); }

}  // extern "C"

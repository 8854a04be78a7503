// Native streaming-IO hot path for the modem CLI.
//
// The reference pulls single bytes from stdin *inside the per-sample hot loop*
// (`/root/reference/src/modem/data.rs:142-159`) and transmutes i16 words one at
// a time (`src/bin/util.rs:13-24`). Here the equivalent work is batch
// transforms over whole buffers, exposed to Python via ctypes: ASCII bit
// parsing, little-endian sample (de)serialization, and the demodulator's text
// output formatting. All functions are allocation-free over caller buffers.
//
// Build: see native/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Parse ASCII '0'/'1' bits, skipping whitespace. The reference checks
// `(byte as char).is_whitespace()` (`data.rs:151`), i.e. Rust's Unicode
// predicate on the Latin-1 interpretation of the byte — which accepts the
// ASCII whitespace set plus 0x85 (NEL) and 0xA0 (NBSP). Returns the number
// of bits written to `out`, or -(pos+1) on the first invalid byte at `pos`.
long modemio_parse_ascii_bits(const char* in, long n, uint8_t* out) {
    long w = 0;
    for (long i = 0; i < n; ++i) {
        const unsigned char c = static_cast<unsigned char>(in[i]);
        if (c == '0' || c == '1') {
            out[w++] = static_cast<uint8_t>(c - '0');
        } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
                   c == '\v' || c == '\f' || c == 0x85 || c == 0xA0) {
            continue;
        } else {
            return -(i + 1);
        }
    }
    return w;
}

// Render bits back to ASCII (no separators), the inverse of the above.
void modemio_format_ascii_bits(const uint8_t* in, long n, char* out) {
    for (long i = 0; i < n; ++i) out[i] = static_cast<char>('0' + (in[i] & 1));
}

// Little-endian i16 words -> f32 samples (the `demodulate` input adapter,
// `bin/util.rs:13-24`; the reference then uses the raw integer value as f32).
void modemio_i16le_to_f32(const uint8_t* in, long n_words, float* out) {
    for (long i = 0; i < n_words; ++i) {
        const uint16_t u = static_cast<uint16_t>(in[2 * i]) |
                           (static_cast<uint16_t>(in[2 * i + 1]) << 8);
        out[i] = static_cast<float>(static_cast<int16_t>(u));
    }
}

// f32 samples -> little-endian bytes (the `modulate` output format,
// `modulate.rs:109-133` via byteorder LE).
void modemio_f32_to_f32le(const float* in, long n, uint8_t* out) {
    for (long i = 0; i < n; ++i) {
        uint32_t u;
        std::memcpy(&u, &in[i], 4);
        out[4 * i] = static_cast<uint8_t>(u);
        out[4 * i + 1] = static_cast<uint8_t>(u >> 8);
        out[4 * i + 2] = static_cast<uint8_t>(u >> 16);
        out[4 * i + 3] = static_cast<uint8_t>(u >> 24);
    }
}

// LE bytes -> f32 (reading back .iq/.f32 files).
void modemio_f32le_to_f32(const uint8_t* in, long n, float* out) {
    for (long i = 0; i < n; ++i) {
        const uint32_t u = static_cast<uint32_t>(in[4 * i]) |
                           (static_cast<uint32_t>(in[4 * i + 1]) << 8) |
                           (static_cast<uint32_t>(in[4 * i + 2]) << 16) |
                           (static_cast<uint32_t>(in[4 * i + 3]) << 24);
        float f;
        std::memcpy(&f, &u, 4);
        out[i] = f;
    }
}

// Interleave I/Q planes into (i, q) pairs (the --iq output layout,
// `modulate.rs:109-116`).
void modemio_interleave_iq(const float* i_plane, const float* q_plane, long n,
                           float* out) {
    for (long k = 0; k < n; ++k) {
        out[2 * k] = i_plane[k];
        out[2 * k + 1] = q_plane[k];
    }
}

// Format the demodulator's per-sample text records "i:<v>\tq:<v>\n"
// (`demodulate.rs:41-43`). Returns bytes written, or -1 if `cap` would be
// exceeded. %g gives round-trippable-enough text; exact Rust float text is
// not part of the byte format (the binary formats are).
long modemio_format_iq_text(const float* i_plane, const float* q_plane, long n,
                            char* out, long cap) {
    long w = 0;
    for (long k = 0; k < n; ++k) {
        if (cap - w < 64) return -1;
        w += std::snprintf(out + w, static_cast<size_t>(cap - w),
                           "i:%g\tq:%g\n", static_cast<double>(i_plane[k]),
                           static_cast<double>(q_plane[k]));
    }
    return w;
}

}  // extern "C"

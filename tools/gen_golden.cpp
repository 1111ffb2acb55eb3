// Golden-vector generator (TEST TOOLING, not part of the framework).
//
// Compiles the *reference* repository's header-only codec library
// (/root/reference/LoRaCodes.hpp, passed via -include on the compile line)
// as an oracle and dumps deterministic test vectors to JSON.  This lets the
// JAX implementation be checked bit-exactly against the actual SX1272
// codec behavior without installing Pothos.  No reference code lives in
// this repository; this file only *calls* the oracle functions.
//
// Usage: gen_golden > tests/golden/golden.json

#include <cstdint>
#include <cstddef>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <complex>
#include <cmath>

#include "ChirpGenerator.hpp"  // reference oracle (-I /root/reference, Pothos stubbed)
#include "LoRaDetector.hpp"    // reference detector oracle (kissfft-backed)

// The reference header is injected with:  g++ -include $(REF)/LoRaCodes.hpp
// It provides: headerChecksum, sx1272DataChecksum, Sx1272ComputeWhitening,
// Sx1272ComputeWhiteningLfsr, encode/decode Hamming + parity, gray maps,
// diagonalInterleaveSx / diagonalDeterleaveSx, roundUp, and the
// HEADER_RDD / N_HEADER_SYMBOLS / N_HEADER_CODEWORDS constants.

static void print_u8_array(const char *key, const std::vector<uint8_t> &v,
                           bool trailing_comma = true) {
    printf("  \"%s\": [", key);
    for (size_t i = 0; i < v.size(); i++)
        printf("%s%u", i ? "," : "", unsigned(v[i]));
    printf("]%s\n", trailing_comma ? "," : "");
}

static void print_u16_array(const char *key, const std::vector<uint16_t> &v,
                            bool trailing_comma = true) {
    printf("  \"%s\": [", key);
    for (size_t i = 0; i < v.size(); i++)
        printf("%s%u", i ? "," : "", unsigned(v[i]));
    printf("]%s\n", trailing_comma ? "," : "");
}

// deterministic pseudo-random bytes (xorshift32), independent of libc rand
static uint32_t g_seed = 0x10A4C0DE;
static uint8_t next_byte() {
    g_seed ^= g_seed << 13;
    g_seed ^= g_seed >> 17;
    g_seed ^= g_seed << 5;
    return uint8_t(g_seed & 0xFF);
}

// Reference encode pipeline (mirrors LoRaEncoder::work, LoRaEncoder.cpp:161-232,
// calling only oracle functions), with the one divergence that padding
// nibbles beyond the payload are ZERO (the reference reads uninitialized
// memory there; both sides agree payload bytes round-trip regardless).
static std::vector<uint16_t> oracle_encode(const std::vector<uint8_t> &payload,
                                           size_t sf, size_t ppm_in, size_t rdd,
                                           bool explicit_hdr, bool crc,
                                           bool whitening) {
    const size_t PPM = (ppm_in == 0) ? sf : ppm_in;
    size_t payloadLength = payload.size() + (crc ? 2 : 0);
    std::vector<uint8_t> bytes(payloadLength, 0);
    std::memcpy(bytes.data(), payload.data(), payload.size());
    const size_t numCodewords =
        roundUp(bytes.size() * 2 + (explicit_hdr ? N_HEADER_CODEWORDS : 0), PPM);
    const size_t numSymbols =
        N_HEADER_SYMBOLS + (numCodewords / PPM - 1) * (4 + rdd);

    if (crc) {
        uint16_t c = sx1272DataChecksum(bytes.data(), payload.size());
        bytes[payload.size()] = c & 0xFF;
        bytes[payload.size() + 1] = (c >> 8) & 0xFF;
    }

    // zero-extend so FEC of padding nibbles is deterministic
    std::vector<uint8_t> padded(bytes);
    padded.resize((numCodewords + 1) / 2 + 4, 0);

    std::vector<uint8_t> codewords(numCodewords, 0);
    size_t cOfs = 0, dOfs = 0;
    if (explicit_hdr) {
        uint8_t hdr[3];
        hdr[0] = uint8_t(payload.size());
        hdr[1] = (crc ? 1 : 0) | uint8_t(rdd << 1);
        hdr[2] = headerChecksum(hdr);
        codewords[cOfs++] = encodeHamming84sx(hdr[0] >> 4);
        codewords[cOfs++] = encodeHamming84sx(hdr[0] & 0xF);
        codewords[cOfs++] = encodeHamming84sx(hdr[1] & 0xF);
        codewords[cOfs++] = encodeHamming84sx(hdr[2] >> 4);
        codewords[cOfs++] = encodeHamming84sx(hdr[2] & 0xF);
    }
    auto encodeFec = [&](size_t RDD, size_t count) {
        for (size_t i = 0; i < count; i++, dOfs++) {
            uint8_t nib = (dOfs & 1) ? (padded[dOfs >> 1] >> 4)
                                     : (padded[dOfs >> 1] & 0xF);
            uint8_t cw = nib;
            if (RDD == 1) cw = encodeParity54(nib);
            else if (RDD == 2) cw = encodeParity64(nib);
            else if (RDD == 3) cw = encodeHamming74sx(nib);
            else if (RDD == 4) cw = encodeHamming84sx(nib);
            codewords[cOfs++] = cw;
        }
    };
    size_t cOfs1 = cOfs;
    encodeFec(4, PPM - cOfs);
    if (whitening)
        Sx1272ComputeWhitening(codewords.data() + cOfs1, PPM - cOfs1, 0, HEADER_RDD);
    if (numCodewords > PPM) {
        size_t cOfs2 = cOfs;
        encodeFec(rdd, numCodewords - PPM);
        if (whitening)
            Sx1272ComputeWhitening(codewords.data() + cOfs2, numCodewords - PPM,
                                   int(PPM - cOfs1), int(rdd));
    }

    std::vector<uint16_t> symbols(numSymbols, 0);
    diagonalInterleaveSx(codewords.data(), PPM, symbols.data(), PPM, HEADER_RDD);
    if (numCodewords > PPM)
        diagonalInterleaveSx(codewords.data() + PPM, numCodewords - PPM,
                             symbols.data() + N_HEADER_SYMBOLS, PPM, rdd);
    for (auto &sym : symbols) {
        sym = grayToBinary16(sym);
        sym = uint16_t(sym << (sf - PPM));
    }
    return symbols;
}

static void print_cf_array(const char *key,
                           const std::vector<std::complex<float>> &v,
                           bool trailing_comma = true) {
    printf("  \"%s\": [", key);
    for (size_t i = 0; i < v.size(); i++)
        printf("%s%.9g,%.9g", i ? "," : "", double(v[i].real()), double(v[i].imag()));
    printf("]%s\n", trailing_comma ? "," : "");
}

static void dump_chirp(const char *key, int N, int ovs, int NN, float f0_bins,
                       bool down, float phase0) {
    std::vector<std::complex<float>> samps(NN);
    float phaseAccum = phase0;
    float f0 = float(2 * M_PI * f0_bins) / (N * ovs);
    genChirp(samps.data(), N, ovs, NN, f0, down, 1.0f, phaseAccum);
    print_cf_array(key, samps);
    printf("  \"%s_endphase\": [%.9g],\n", key, double(phaseAccum));
}

int main() {
    printf("{\n");

    // 0. reference genChirp waveforms (ChirpGenerator.hpp:21-47)
    dump_chirp("chirp_n16_s0_up", 16, 1, 16, 0.0f, false, 0.0f);
    dump_chirp("chirp_n16_s5_up", 16, 1, 16, 5.0f, false, 0.0f);
    dump_chirp("chirp_n16_s0_down", 16, 1, 16, 0.0f, true, 0.0f);
    dump_chirp("chirp_n16_ovs4_s3_up", 16, 4, 64, 3.0f, false, 0.0f);
    dump_chirp("chirp_n16_quarter_down", 16, 1, 4, 0.0f, true, 0.5f);
    dump_chirp("chirp_n256_s77_up", 256, 1, 256, 77.0f, false, 0.7853981634f);

    // 1. whitening streams: both generator forms, raw (applied to zeros)
    for (int rdd = 0; rdd <= 4; rdd++) {
        std::vector<uint8_t> tbl(120, 0), lfsr(120, 0);
        Sx1272ComputeWhitening(tbl.data(), tbl.size(), 0, rdd);
        Sx1272ComputeWhiteningLfsr(lfsr.data(), lfsr.size(), 0, rdd);
        char key[64];
        snprintf(key, sizeof key, "whiten_table_rdd%d", rdd);
        print_u8_array(key, tbl);
        snprintf(key, sizeof key, "whiten_lfsr_rdd%d", rdd);
        print_u8_array(key, lfsr);
    }
    // whitening with bit offsets
    for (int ofs : {1, 7, 12}) {
        std::vector<uint8_t> lfsr(40, 0);
        Sx1272ComputeWhiteningLfsr(lfsr.data(), lfsr.size(), ofs, 4);
        char key[64];
        snprintf(key, sizeof key, "whiten_lfsr_rdd4_ofs%d", ofs);
        print_u8_array(key, lfsr);
    }

    // 2. CRC16 over deterministic payloads
    {
        std::vector<uint8_t> crc_lo, crc_hi;
        for (size_t len : {0, 1, 2, 5, 16, 64, 255}) {
            std::vector<uint8_t> data(len);
            for (auto &b : data) b = next_byte();
            uint16_t c = sx1272DataChecksum(data.data(), int(len));
            crc_lo.push_back(c & 0xFF);
            crc_hi.push_back(c >> 8);
            char key[64];
            snprintf(key, sizeof key, "crc_payload_len%zu", len);
            print_u8_array(key, data);
        }
        print_u8_array("crc_lo", crc_lo);
        print_u8_array("crc_hi", crc_hi);
    }

    // 3. header checksum sweep
    {
        std::vector<uint8_t> hc;
        for (int h0 = 0; h0 < 256; h0 += 7) {
            for (int h1 = 0; h1 < 16; h1 += 3) {
                uint8_t h[2] = {uint8_t(h0), uint8_t(h1)};
                hc.push_back(headerChecksum(h));
            }
        }
        print_u8_array("header_checksums", hc);
    }

    // 4. FEC encode tables
    {
        std::vector<uint8_t> h84, h74, p54, p64;
        for (int n = 0; n < 16; n++) {
            h84.push_back(encodeHamming84sx(uint8_t(n)));
            h74.push_back(encodeHamming74sx(uint8_t(n)));
            p54.push_back(encodeParity54(uint8_t(n)));
            p64.push_back(encodeParity64(uint8_t(n)));
        }
        print_u8_array("enc_hamming84", h84);
        print_u8_array("enc_hamming74", h74);
        print_u8_array("enc_parity54", p54);
        print_u8_array("enc_parity64", p64);
    }

    // 5. interleaver vectors (one block per PPM x RDD)
    for (size_t ppm = 7; ppm <= 12; ppm++) {
        for (size_t rdd = 0; rdd <= 4; rdd++) {
            std::vector<uint8_t> cw(ppm);
            uint8_t mask = uint8_t((1u << (4 + rdd)) - 1);
            for (auto &c : cw) c = next_byte() & mask;
            std::vector<uint16_t> sym(4 + rdd, 0);
            diagonalInterleaveSx(cw.data(), cw.size(), sym.data(), ppm, rdd);
            char key[64];
            snprintf(key, sizeof key, "il_cw_ppm%zu_rdd%zu", ppm, rdd);
            print_u8_array(key, cw);
            snprintf(key, sizeof key, "il_sym_ppm%zu_rdd%zu", ppm, rdd);
            print_u16_array(key, sym);
        }
    }

    // 6. end-to-end encoder symbol vectors (SF x CR grid, fixed payload)
    {
        std::vector<uint8_t> payload(23);
        for (auto &b : payload) b = next_byte();
        print_u8_array("enc_payload", payload);
        for (size_t sf = 7; sf <= 12; sf++) {
            for (size_t rdd = 0; rdd <= 4; rdd++) {
                auto symbols = oracle_encode(payload, sf, 0, rdd, true, true, true);
                char key[64];
                snprintf(key, sizeof key, "enc_symbols_sf%zu_rdd%zu", sf, rdd);
                print_u16_array(key, symbols);
            }
        }
        // reduced symbol set (ppm = sf-2), implicit, no crc, no whitening combos
        auto s1 = oracle_encode(payload, 11, 9, 3, true, true, true);
        print_u16_array("enc_symbols_sf11_ppm9_rdd3", s1);
        auto s2 = oracle_encode(payload, 10, 0, 4, false, false, true);
        print_u16_array("enc_symbols_implicit_nocrc", s2);
        auto s3 = oracle_encode(payload, 10, 0, 4, true, true, false);
        print_u16_array("enc_symbols_nowhiten", s3);
        auto s4 = oracle_encode(payload, 10, 0, 1, true, true, true);
        print_u16_array("enc_symbols_rdd1", s4);
    }

    // 7. detector vectors (LoRaDetector.hpp:29-64 via the reference's own
    // kissfft): post-dechirp windows -> (argmax, power dB, powerAvg dB,
    // fractional-bin fIndex).  Inputs are dumped so the python side feeds
    // the identical samples.
    {
        struct Case { const char *key; size_t N; int bin; float amp;
                      float noise; float phase; };
        const Case cases[] = {
            {"det_n16_tone5",      16,   5,  1.0f, 0.0f, 0.3f},
            {"det_n16_noisy",      16,  11,  1.0f, 0.5f, 1.1f},
            {"det_n256_noisy",    256,  77,  1.0f, 1.0f, 0.7f},
            {"det_n256_noise",    256,  -1,  0.0f, 1.0f, 0.0f},
            {"det_n1024_noisy",  1024, 700,  1.0f, 2.0f, 2.2f},
        };
        for (size_t c = 0; c < sizeof(cases) / sizeof(cases[0]); c++) {
            const Case &cs = cases[c];
            std::vector<std::complex<float>> in(cs.N);
            for (size_t i = 0; i < cs.N; i++) {
                float re = 0.f, im = 0.f;
                if (cs.noise > 0) {
                    // deterministic noise from the shared xorshift stream
                    re = cs.noise * (float(next_byte()) / 127.5f - 1.0f);
                    im = cs.noise * (float(next_byte()) / 127.5f - 1.0f);
                }
                if (cs.bin >= 0) {
                    float ang = 2.0f * float(M_PI) * cs.bin * i / cs.N
                                + cs.phase;
                    re += cs.amp * std::cos(ang);
                    im += cs.amp * std::sin(ang);
                }
                in[i] = {re, im};
            }
            LoRaDetector<float> det(cs.N);
            for (size_t i = 0; i < cs.N; i++) det.feed(i, in[i]);
            float power = 0, powerAvg = 0, fIndex = 0;
            size_t value = det.detect(power, powerAvg, fIndex);
            char key[64];
            snprintf(key, sizeof key, "%s_in", cs.key);
            print_cf_array(key, in);
            bool last = (c + 1 == sizeof(cases) / sizeof(cases[0]));
            printf("  \"%s_out\": [%zu,%.9g,%.9g,%.9g]%s\n", cs.key,
                   value, double(power), double(powerAvg), double(fIndex),
                   last ? "" : ",");
        }
    }

    printf("}\n");
    return 0;
}

// Demodulator oracle driver (TEST TOOLING, not part of the framework).
//
// Compiles the *reference* repository's LoRaDemod block — the 5-state
// sample-consuming FSM (/root/reference/LoRaDemod.cpp) — against the
// minimal Pothos stub (pothos_stub/Pothos/Framework.hpp) and drives it
// over an interleaved-cf32 capture file.  Prints one JSON object:
//
//   {"packets": [[sym, ...], ...],          // int16 symbols per frame
//    "signals": [{"error": E, "power": P, "snr": S}, ...],  // per frame
//    "consumed": total_samples_consumed}
//
// This lets the JAX demodulator be cross-checked frame-for-frame against
// the actual reference timing-recovery/sync/CFO behavior on identical
// waveforms (tests/test_demod_oracle.py) without installing Pothos.
// No reference code lives in this repository; this file only *drives*
// the reference block.
//
// Usage: gen_demod_golden <file.cf32> <sf> <sync> <thresh_dB> <mtu>

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "LoRaDemod.cpp"  // the reference block (-I /root/reference)

int main(int argc, char **argv)
{
    if (argc != 6)
    {
        fprintf(stderr,
                "usage: %s <file.cf32> <sf> <sync> <thresh_dB> <mtu>\n",
                argv[0]);
        return 2;
    }
    const size_t sf = strtoul(argv[2], nullptr, 0);
    const unsigned sync = unsigned(strtoul(argv[3], nullptr, 0));
    const double thresh = atof(argv[4]);
    const size_t mtu = strtoul(argv[5], nullptr, 0);
    const size_t N = size_t(1) << sf;

    FILE *f = fopen(argv[1], "rb");
    if (f == nullptr)
    {
        fprintf(stderr, "cannot open %s\n", argv[1]);
        return 2;
    }
    std::vector<uint8_t> bytes;
    uint8_t chunk[65536];
    size_t got = 0;
    while ((got = fread(chunk, 1, sizeof(chunk), f)) > 0)
        bytes.insert(bytes.end(), chunk, chunk + got);
    fclose(f);

    LoRaDemod *blk = static_cast<LoRaDemod *>(LoRaDemod::make(sf));
    blk->setSync((unsigned char)sync);
    blk->setThreshold(thresh);
    blk->setMTU(mtu);
    blk->activate();
    blk->input(0)->feedBytes(bytes.data(), bytes.size(), 8);

    auto *in = blk->input(0);
    auto *out = blk->output(size_t(0));
    std::vector<std::map<std::string, double>> sigs;
    size_t seen = 0;
    while (in->elements() >= 2 * N)
    {
        const size_t before = in->totalElements();
        blk->work();
        if (in->totalElements() == before) break;  // no progress
        if (out->packets.size() > seen)
        {
            sigs.push_back(blk->signals);
            seen = out->packets.size();
        }
    }

    printf("{\n  \"packets\": [");
    for (size_t p = 0; p < out->packets.size(); p++)
    {
        const auto &pkt = out->packets[p];
        const int16_t *sym = pkt.payload.as<const int16_t *>();
        const size_t n = pkt.payload.length / sizeof(int16_t);
        printf("%s[", p ? "," : "");
        for (size_t i = 0; i < n; i++)
            printf("%s%d", i ? "," : "", int(sym[i]));
        printf("]");
    }
    printf("],\n  \"signals\": [");
    for (size_t p = 0; p < sigs.size(); p++)
    {
        printf("%s{\"error\": %g, \"power\": %g, \"snr\": %g}",
               p ? "," : "", sigs[p]["error"], sigs[p]["power"],
               sigs[p]["snr"]);
    }
    printf("],\n  \"consumed\": %zu\n}\n", in->totalElements());
    delete blk;
    return 0;
}

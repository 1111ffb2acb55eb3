// Modulator oracle driver (TEST TOOLING, not part of the framework).
//
// Compiles the *reference* repository's LoRaMod block — the 9-state
// per-symbol waveform FSM (/root/reference/LoRaMod.cpp): 10 preamble
// upchirps, 2 sync chirps, 2 downchirps, quarter downchirp, data chirps,
// continuous phase accumulator — against the minimal Pothos stub and
// drives one frame through it.  Symbols (uint16 little-endian) are read
// from a file; the produced complex waveform is written as interleaved
// cf32.  Used by tests/test_demod_oracle.py to prove reference-TX ->
// our-RX interop.  No reference code lives in this repository.
//
// Usage: gen_mod_golden <symbols.u16> <out.cf32> <sf> <sync> <ovs>
//                       <padding> <ampl>

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "LoRaMod.cpp"  // the reference block (-I /root/reference)

int main(int argc, char **argv)
{
    if (argc != 8)
    {
        fprintf(stderr,
                "usage: %s <symbols.u16> <out.cf32> <sf> <sync> <ovs> "
                "<padding> <ampl>\n",
                argv[0]);
        return 2;
    }
    const size_t sf = strtoul(argv[3], nullptr, 0);
    const unsigned sync = unsigned(strtoul(argv[4], nullptr, 0));
    const size_t ovs = strtoul(argv[5], nullptr, 0);
    const size_t padding = strtoul(argv[6], nullptr, 0);
    const float ampl = float(atof(argv[7]));

    FILE *f = fopen(argv[1], "rb");
    if (f == nullptr) return 2;
    std::vector<uint16_t> syms;
    uint16_t s16 = 0;
    while (fread(&s16, sizeof(s16), 1, f) == 1) syms.push_back(s16);
    fclose(f);

    LoRaMod *blk = static_cast<LoRaMod *>(LoRaMod::make(sf));
    blk->setSync((unsigned char)sync);
    blk->setOvs(ovs);
    blk->setPadding(padding);
    blk->setAmplitude(ampl);
    blk->activate();

    Pothos::Packet pkt;
    pkt.payload = Pothos::BufferChunk(typeid(uint16_t), syms.size());
    memcpy(pkt.payload.as<uint16_t *>(), syms.data(),
           syms.size() * sizeof(uint16_t));
    blk->input(0)->pushMessage(Pothos::Object(pkt));

    auto *out = blk->output(size_t(0));
    std::vector<std::complex<float>> wave;
    size_t produced = 0;
    size_t idle = 0;
    for (size_t iter = 0; iter < (1u << 20) && idle < 2; iter++)
    {
        blk->work();
        const size_t now = out->totalElements();
        if (now == produced)
        {
            // zero-delta calls: the message pop (start) and the return
            // to WAITINPUT with an empty queue (end)
            idle++;
            continue;
        }
        idle = 0;
        const auto *samps =
            out->buffer().as<const std::complex<float> *>();
        wave.insert(wave.end(), samps, samps + (now - produced));
        produced = now;
    }

    FILE *o = fopen(argv[2], "wb");
    if (o == nullptr) return 2;
    fwrite(wave.data(), sizeof(std::complex<float>), wave.size(), o);
    fclose(o);
    fprintf(stderr, "samples=%zu labels=%zu\n", wave.size(),
            out->labels.size());
    return 0;
}

// empty stub: satisfies ChirpGenerator.hpp's include for oracle builds
